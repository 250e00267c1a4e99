"""Parity sweep for the round-14 registration queue
(oraaud_kafka_spark/queries/pending.py PENDING_R14): each pending
operator runs Spark-vs-DuckDB at the local test SF exactly the way the
driver gate will once it is registered — so registration adds only the
@query decorator and a _FRONT slot, never cold code."""

from __future__ import annotations

import pytest

from oraaud_kafka_spark.queries.pending import PENDING_R14
from oraaud_kafka_spark.testing import compare_frames, run_oracle

from .conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(PENDING_R14))
def test_pending_r14_matches_oracle(spark, name):
    fn, oracle = PENDING_R14[name]
    got = fn(spark, SF_DIR).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR}"


def test_triangle_count_structure(spark):
    """Degree-ordered orientation counts every triangle exactly once:
    the top-5 rows carry positive per-node counts bounded by the global
    total (each triangle touches a node once), and transitivity =
    3*tri/wedges stays in (0, 1]."""
    fn, _ = PENDING_R14["q_graph_triangle_count"]
    got = fn(spark, SF_DIR).toPandas()
    assert (got["n_tri"] > 0).all()
    assert (got["n_tri"] <= got["n_triangles"]).all()
    assert got["n_triangles"].iloc[0] > 0
    t = got["transitivity"].iloc[0]
    assert 0 < t <= 1.0


def test_cms_never_underestimates_and_merges(spark):
    """The two CMS certificates: est >= exact on every probed key (a
    Count-Min cell only ever over-counts), and the cell-wise merge of
    the per-priority sketches equals the directly-built sketch."""
    fn, _ = PENDING_R14["q_agg_cms_heavy_hitters"]
    got = fn(spark, SF_DIR).toPandas()
    assert (got["overestimate"] >= 0).all()
    assert got["merged_equals_direct"].all()
    assert got["within_eps"].all()


def test_bloom_admits_every_true_match(spark):
    """The Bloom no-false-negative certificate: n_missed == 0 for every
    sizing, the pass set is a superset of the exact matches, and the
    larger filter never has a worse false-positive rate."""
    fn, _ = PENDING_R14["q_join_bloom_prune_eval"]
    got = fn(spark, SF_DIR).toPandas().sort_values("m_bits")
    assert (got["n_missed"] == 0).all()
    assert (got["n_pass"] >= got["n_exact"]).all()
    rates = got["fp_rate"].tolist()
    assert rates[-1] <= rates[0]


@pytest.mark.parametrize("name", sorted(PENDING_R14))
def test_pending_r14_matches_oracle_at_correctness_sf(spark, name):
    """The same sweep at the DRIVER's correctness SF — committed, not
    run-by-hand (see test_pending_r13)."""
    from .conftest import SF_DIR_CORRECTNESS

    fn, oracle = PENDING_R14[name]
    got = fn(spark, SF_DIR_CORRECTNESS).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR_CORRECTNESS))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR_CORRECTNESS}"
