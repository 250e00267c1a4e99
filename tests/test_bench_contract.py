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


def test_no_per_query_regression_between_recorded_rounds():
    """Artifact-level regression gate: compare the two most recent
    driver-recorded BENCH_r*.json (same sf, completed runs only) and
    fail on any shared query slowing more than 2x. DNF rounds (rc != 0
    or parsed null, e.g. round 4) are not scores and are skipped, per
    round-4 ADVICE. Sub-200 ms timings are exempt — at that size the
    2x threshold is inside shared-infra noise."""
    import glob

    import pytest

    runs = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            d = json.load(f)
        if d.get("rc") == 0 and d.get("parsed"):
            runs.append((os.path.basename(path), d))
    if len(runs) < 2:
        pytest.skip("fewer than two completed bench artifacts")
    (prev_name, prev), (cur_name, cur) = runs[-2], runs[-1]
    if prev.get("sf") != cur.get("sf"):
        pytest.skip("scale factor changed between recorded rounds")
    prev_q = {**prev["parsed"]["queries"], **prev["parsed"].get("queries_extra", {})}
    cur_q = {**cur["parsed"]["queries"], **cur["parsed"].get("queries_extra", {})}
    slow = {
        q: (prev_q[q], cur_q[q])
        for q in prev_q.keys() & cur_q.keys()
        if cur_q[q] > 2.0 * prev_q[q] and cur_q[q] > 0.2
    }
    assert not slow, (
        f"{cur_name} regressed >2x vs {prev_name} on: {slow}"
    )
