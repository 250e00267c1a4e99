"""bench.py is parsed by the external driver: stdout must be EXACTLY one
JSON line with the declared keys. A crash or stray stdout print records a
DNF for the whole round (round 4's fate), so the contract gets its own
end-to-end test at the smallest scale factor."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_single_json_line_contract():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"bench crashed:\n{proc.stderr[-2000:]}"
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got {len(lines)}: {lines[:3]}"
    d = json.loads(lines[0])
    assert d["metric"] == "headline_queries_total_sec"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert d["sf"] == 0.001
    # every declared headline/extra ran and timed
    from bench import EXTRAS, HEADLINE

    assert set(d["queries"]) == set(HEADLINE)
    assert set(d["queries_extra"]) == set(EXTRAS)
    assert all(v > 0 for v in d["queries"].values())
    assert d["ingest_mbps"] > 0
