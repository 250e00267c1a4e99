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
