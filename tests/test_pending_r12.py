"""Parity sweep for the round-12 registration queue
(oraaud_kafka_spark/queries/pending.py): each pending operator runs
Spark-vs-DuckDB at the local test SF exactly the way the driver gate
will once it is registered — so registration next round adds only the
@query decorator and a _FRONT slot, never cold code."""

from __future__ import annotations

import pytest

from oraaud_kafka_spark.queries.pending import PENDING_R12
from oraaud_kafka_spark.testing import compare_frames, run_oracle

from .conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(PENDING_R12))
def test_pending_r12_matches_oracle(spark, name):
    fn, oracle = PENDING_R12[name]
    got = fn(spark, SF_DIR).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR}"


def test_pending_r12_theta_certification_holds(spark):
    fn, _ = PENDING_R12["q_agg_theta_audience_overlap"]
    got = fn(spark, SF_DIR).toPandas()
    assert got["within_rel_error"].all()


@pytest.mark.parametrize("name", sorted(PENDING_R12))
def test_pending_r12_matches_oracle_at_correctness_sf(spark, name):
    """The same sweep at the DRIVER's correctness SF — committed, not
    run-by-hand, so a divergence that only manifests at sf0.01 (an
    ordering tie, an overflow boundary) cannot hide until
    registration."""
    from .conftest import SF_DIR_CORRECTNESS

    fn, oracle = PENDING_R12[name]
    got = fn(spark, SF_DIR_CORRECTNESS).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR_CORRECTNESS))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR_CORRECTNESS}"
