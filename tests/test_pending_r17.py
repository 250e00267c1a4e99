"""Parity sweep for the round-17 registration queue
(oraaud_kafka_spark/queries/pending.py PENDING_R17): each pending
operator runs Spark-vs-DuckDB at the local test SF exactly the way the
driver gate will once it is registered — so registration adds only the
@query decorator and a _FRONT slot, never cold code."""

from __future__ import annotations

import pytest

from oraaud_kafka_spark.queries.pending import PENDING_R17
from oraaud_kafka_spark.testing import compare_frames, run_oracle

from .conftest import SF_DIR, SF_DIR_CORRECTNESS


@pytest.mark.parametrize("name", sorted(PENDING_R17))
def test_pending_r17_matches_oracle(spark, name):
    fn, oracle = PENDING_R17[name]
    got = fn(spark, SF_DIR).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR}"


@pytest.mark.parametrize("name", sorted(PENDING_R17))
def test_pending_r17_matches_oracle_at_correctness_sf(spark, name):
    """The same sweep at the DRIVER's correctness SF — committed, not
    run-by-hand."""
    fn, oracle = PENDING_R17[name]
    got = fn(spark, SF_DIR_CORRECTNESS).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR_CORRECTNESS))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR_CORRECTNESS}"


def test_moments_bounds_hold_and_are_not_vacuous(spark):
    """The Cantelli envelope must contain the exact p95 on every type
    (the certified claim), the envelope must be a REAL constraint
    (finite, nonzero width, lo < q95 < hi strictly somewhere), and the
    moment-derived stats must be populated wherever variance exists.
    The merge certificate itself is the oracle hash match: Spark sums
    two event_id-parity slices and merges, the oracle sums once."""
    fn, _ = PENDING_R17["q_agg_moments_rollup"]
    got = fn(spark, SF_DIR).toPandas()
    assert got["q95_within"].all()
    assert (got["q95_lo"] < got["q95_hi"]).all()
    assert (got["n"] > 0).all()
    varying = got[got["std_cents"] > 0]
    assert len(varying) > 0
    assert varying["skewness"].notna().all()
    assert varying["ex_kurtosis"].notna().all()
    # the bound is data-derived, not infinite: hi stays within one
    # order of magnitude of the exact quantile on this fixture
    assert (varying["q95_hi"] < varying["q95_exact"] * 20).all()


def test_heaps_growth_is_monotone_and_saturating(spark):
    """Cumulative vocabulary and token counts are nondecreasing in the
    decile order, every token is accounted exactly once (new_vocab
    sums to the final vocabulary), and the fit columns are constant
    finite values."""
    fn, _ = PENDING_R17["q_text_heaps_law"]
    got = fn(spark, SF_DIR).toPandas().sort_values("decile")
    assert list(got["decile"]) == list(range(1, 11))
    for col in ("n_docs_cum", "n_tokens_cum", "vocab_cum"):
        vals = got[col].tolist()
        assert vals == sorted(vals), (col, vals)
    assert got["new_vocab"].sum() == got["vocab_cum"].iloc[-1]
    assert got["heaps_beta"].nunique() == 1
    assert got["heaps_k"].nunique() == 1
    beta = got["heaps_beta"].iloc[0]
    assert 0 <= beta < 1, beta


def test_density_core_ranks_are_coherent(spark):
    """Top-10 densest vectors come out in (core_dist, vec_id) order,
    the density ratio is the stated normalization, and every reported
    core distance sits at or below the corpus mean (these are the
    densest points by construction)."""
    fn, _ = PENDING_R17["q_dedup_density_core"]
    got = fn(spark, SF_DIR).toPandas()
    assert list(got["rank"]) == list(range(1, 11))
    dists = got["core_dist"].tolist()
    assert dists == sorted(dists)
    assert (got["core_dist"] <= got["mean_core_dist"] + 1e-9).all()
    ratio = got["core_dist"] / got["mean_core_dist"]
    assert ((got["density_ratio"] - ratio).abs() < 1e-4).all()
    assert (got["n_vectors"] > 10).all()
