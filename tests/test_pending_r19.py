"""Parity sweep for the round-19 registration queue
(oraaud_kafka_spark/queries/pending.py PENDING_R19): each pending
operator runs Spark-vs-DuckDB at the local test SF exactly the way the
driver gate will once it is registered — so registration adds only the
@query decorator and a _FRONT slot, never cold code."""

from __future__ import annotations

import pytest

from oraaud_kafka_spark.queries.pending import PENDING_R19
from oraaud_kafka_spark.testing import compare_frames, run_oracle

from .conftest import SF_DIR, SF_DIR_CORRECTNESS


@pytest.mark.parametrize("name", sorted(PENDING_R19))
def test_pending_r19_matches_oracle(spark, name):
    fn, oracle = PENDING_R19[name]
    got = fn(spark, SF_DIR).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR}"


@pytest.mark.parametrize("name", sorted(PENDING_R19))
def test_pending_r19_matches_oracle_at_correctness_sf(spark, name):
    """The same sweep at the DRIVER's correctness SF — committed, not
    run-by-hand."""
    fn, oracle = PENDING_R19[name]
    got = fn(spark, SF_DIR_CORRECTNESS).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR_CORRECTNESS))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR_CORRECTNESS}"


def test_pps_sample_is_calibrated(spark):
    """Poisson PPS with the HT estimator: expected sample size ~_PPS_N
    (within 4 sigma of the Poisson-binomial bound), HT totals within
    25% of truth per priority on this fixture, and certainty units
    (p = 1) always drawn."""
    from oraaud_kafka_spark.queries.pending import _PPS_N

    fn, _ = PENDING_R19["q_sample_pps_poisson"]
    got = fn(spark, SF_DIR).toPandas()
    n = got["n_sampled"].sum()
    # var <= sum p_i(1-p_i) <= _PPS_N
    assert abs(n - _PPS_N) <= 4 * _PPS_N**0.5, n
    assert (got["n_sampled"] > 0).all()
    # HT is unbiased but per-stratum noisy at ~_PPS_N/5 draws; the
    # corpus-level estimate (all strata pooled) is the calibrated claim
    assert (got["rel_error"].abs() < 0.5).all(), got["rel_error"]
    pooled = (
        got["ht_total_cents"].sum() / got["true_total_cents"].sum() - 1
    )
    assert abs(pooled) < 0.15, pooled


def test_rrf_fuses_genuinely_different_rankings(spark):
    """Full-precision and truncated-cosine rankings must actually
    disagree somewhere in the fused top-5 (else the fusion is vacuous —
    the fixture's unit-norm embeddings make cosine-vs-dot identical,
    which is exactly why the coarse ranker truncates dims instead),
    every fused row carries at least one source rank, and the fused
    order is (rrf desc, cid) per query."""
    fn, _ = PENDING_R19["q_sim_rrf_fusion"]
    got = fn(spark, SF_DIR).toPandas()
    assert len(got) == 50  # 10 queries x top-5
    per_qid = got.groupby("qid")["fused_rank"].apply(list)
    assert all(ranks == [1, 2, 3, 4, 5] for ranks in per_qid), per_qid
    assert (got["rank_full"].notna() | got["rank_half"].notna()).all()
    disagree = got[
        got["rank_full"].isna()
        | got["rank_half"].isna()
        | (got["rank_full"] != got["rank_half"])
    ]
    assert len(disagree) > 0
    # a candidate in BOTH lists at rank 1 fuses above one in a single
    # list: rrf is monotone in list membership
    for _, g in got.groupby("qid"):
        scores = g.sort_values("fused_rank")["rrf_score"].tolist()
        assert scores == sorted(scores, reverse=True)


def test_label_noise_grid_is_a_partition(spark):
    """Every vector lands in exactly one (label, nearest) cell: cell
    counts sum to the label totals, noise shares are consistent, and
    the diagonal clearly beats label-independence chance on this
    fixture (labels carry geometric signal — a chance-level grid would
    mean the audit input is junk). The fixture's 10 labels are weakly,
    not majority, informative: measured diagonal share is ~0.37 vs the
    0.10 uniform-chance floor, so the bar is a multiple of chance, not
    an absolute majority."""
    fn, _ = PENDING_R19["q_emb_label_noise"]
    got = fn(spark, SF_DIR).toPandas()
    sums = got.groupby("label").agg(n=("n", "sum"), t=("n_label", "first"))
    assert (sums["n"] == sums["t"]).all()
    diag = got[got["label"] == got["nearest_label"]]
    share_correct = diag["n"].sum() / got["n"].sum()
    n_labels = got["label"].nunique()
    assert share_correct > 2.5 / n_labels, (share_correct, n_labels)
    offdiag = got[got["label"] != got["nearest_label"]]
    ratio = offdiag["n"] / offdiag["n_label"]
    assert ((offdiag["cell_noise_share"] - ratio).abs() < 1e-4).all()
