"""COVERAGE.md stays in lockstep with the registry: every registered
query name must be listed, and the stated counts must match."""

from __future__ import annotations

import re
from pathlib import Path

from oraaud_kafka_spark import registry

DOC = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def test_every_query_listed_in_coverage_doc():
    registry.load_all()
    text = DOC.read_text()
    missing = [n for n in registry.QUERIES if f"`{n}`" not in text]
    assert not missing, f"COVERAGE.md missing: {missing}"


def test_coverage_doc_counts_match_registry():
    registry.load_all()
    text = DOC.read_text()
    m = re.search(r"`queries\(\)` exposes (\d+) entries; (\d+)\n?", text)
    assert m, "counts line not found"
    assert int(m.group(1)) == len(registry.QUERIES)
    assert int(m.group(2)) == len(registry.ORACLES)


def test_llm_families_register_inside_driver_window():
    """The driver's correctness gate checks a bounded prefix of the
    registration order (50 in round 1). Every LLM-pipeline query must sit
    inside that window, and the round-1-verified families must come last —
    pins the _MODULES ordering that closes round 1's verification hole."""
    from oraaud_kafka_spark import registry

    names = list(registry.all_queries())
    first_50 = set(names[:50])
    llm = {
        n
        for n, fn in registry.all_queries().items()
        if "llm" in getattr(fn, "__wrapped__", fn).__module__
    }
    missing = llm - first_50
    assert not missing, f"LLM queries outside the 50-query window: {sorted(missing)}"
    # the already-verified families bring up the rear
    assert names[-1].startswith("q_sort") or names[-1].startswith("q_window")
