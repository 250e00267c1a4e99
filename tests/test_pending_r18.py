"""Parity sweep for the round-18 registration queue
(oraaud_kafka_spark/queries/pending.py PENDING_R18): each pending
operator runs Spark-vs-DuckDB at the local test SF exactly the way the
driver gate will once it is registered — so registration adds only the
@query decorator and a _FRONT slot, never cold code."""

from __future__ import annotations

import pytest

from oraaud_kafka_spark.queries.pending import PENDING_R18
from oraaud_kafka_spark.testing import compare_frames, run_oracle

from .conftest import SF_DIR, SF_DIR_CORRECTNESS


@pytest.mark.parametrize("name", sorted(PENDING_R18))
def test_pending_r18_matches_oracle(spark, name):
    fn, oracle = PENDING_R18[name]
    got = fn(spark, SF_DIR).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR}"


@pytest.mark.parametrize("name", sorted(PENDING_R18))
def test_pending_r18_matches_oracle_at_correctness_sf(spark, name):
    """The same sweep at the DRIVER's correctness SF — committed, not
    run-by-hand."""
    fn, oracle = PENDING_R18[name]
    got = fn(spark, SF_DIR_CORRECTNESS).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR_CORRECTNESS))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR_CORRECTNESS}"


def test_stl_decomposition_shape_and_bounds(spark):
    """Every type reports a full 24-slot seasonal vector from trended
    buckets only, and the Hyndman strength stays in [0, 1] (the
    greatest() floor plus Var(R) <= Var(S+R) by construction when the
    seasonal is the detrended by-hod mean)."""
    fn, _ = PENDING_R18["q_time_stl_decompose"]
    got = fn(spark, SF_DIR).toPandas()
    per_type = got.groupby("event_type")["hod"].nunique()
    assert (per_type == 24).all(), per_type
    assert (got["n_obs"] > 0).all()
    assert got["seasonal_strength"].between(0, 1).all()
    # strength is a per-type constant repeated across its 24 rows
    assert (got.groupby("event_type")["seasonal_strength"].nunique() == 1).all()
    # trended-bucket count is consistent: each type's hod cells sum to
    # its n_trended
    sums = got.groupby("event_type").agg(
        n=("n_obs", "sum"), t=("n_trended", "first")
    )
    assert (sums["n"] == sums["t"]).all(), sums


def test_rake_phrases_are_stopword_free_and_ranked(spark):
    """Candidate phrases are maximal stopword-free runs: no stopword
    may appear inside any reported phrase; ranks follow the
    (score desc, phrase) order; occurrence counts are positive."""
    from oraaud_kafka_spark.llm.text import _STOPWORDS

    fn, _ = PENDING_R18["q_text_rake_keywords"]
    got = fn(spark, SF_DIR).toPandas()
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    scores = got["score"].tolist()
    assert scores == sorted(scores, reverse=True)
    assert (got["n_occurrences"] > 0).all()
    for phrase, n_words in zip(got["phrase"], got["n_words"]):
        toks = phrase.split(" ")
        assert len(toks) == n_words
        assert not set(toks) & set(_STOPWORDS), phrase


def test_adc_retrieval_beats_random_baseline(spark):
    """The honest claim: 4-byte PQ codes at 64:1 compression on this
    near-uniform synthetic corpus retrieve far better than chance but
    nowhere near exact — the eval EXISTS to measure that tradeoff
    (random recall@10 is k/n_corpus ~ 0.02 here; the lookup-table path
    must clear 5x that on average or the codes carry no signal)."""
    fn, _ = PENDING_R18["q_sim_pq_adc_eval"]
    got = fn(spark, SF_DIR).toPandas()
    assert len(got) == 10
    assert got["recall_at_10"].between(0, 1).all()
    n_corpus = got["n_corpus"].iloc[0]
    random_baseline = 10.0 / n_corpus
    assert got["recall_at_10"].mean() > 5 * random_baseline
    # top1 coherence: match flag is exactly id equality
    assert (
        (got["adc_top1"] == got["exact_top1"]) == got["top1_match"]
    ).all()
