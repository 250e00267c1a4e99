"""Parity sweep for the round-16 registration queue
(oraaud_kafka_spark/queries/pending.py PENDING_R16): each pending
operator runs Spark-vs-DuckDB at the local test SF exactly the way the
driver gate will once it is registered — so registration adds only the
@query decorator and a _FRONT slot, never cold code."""

from __future__ import annotations

import pytest

from oraaud_kafka_spark.queries.pending import PENDING_R16
from oraaud_kafka_spark.testing import compare_frames, run_oracle

from .conftest import SF_DIR, SF_DIR_CORRECTNESS


@pytest.mark.parametrize("name", sorted(PENDING_R16))
def test_pending_r16_matches_oracle(spark, name):
    fn, oracle = PENDING_R16[name]
    got = fn(spark, SF_DIR).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR}"


@pytest.mark.parametrize("name", sorted(PENDING_R16))
def test_pending_r16_matches_oracle_at_correctness_sf(spark, name):
    """The same sweep at the DRIVER's correctness SF — committed, not
    run-by-hand."""
    fn, oracle = PENDING_R16[name]
    got = fn(spark, SF_DIR_CORRECTNESS).toPandas()
    probs = compare_frames(got, run_oracle(oracle, SF_DIR_CORRECTNESS))
    assert not probs, f"{name}: {probs}"
    assert len(got) > 0, f"{name}: empty result at {SF_DIR_CORRECTNESS}"


def test_cluster_cc_is_a_partition_of_the_edge_vertices(spark):
    """Clusters must partition the near-dup vertex set: every doc in
    exactly one cluster, cluster_id = min member, sizes consistent and
    >= 2 (singletons never enter the edge set). The oracle's exact
    recursive closure already certifies convergence via the hash
    match; this pins the structural reading of the output."""
    fn, _ = PENDING_R16["q_dedup_cluster_cc"]
    got = fn(spark, SF_DIR).toPandas()
    all_members: list[int] = []
    for _, row in got.iterrows():
        members = list(row["doc_ids"])
        assert row["n_docs"] == len(members)
        assert row["n_dropped"] == len(members) - 1
        assert row["cluster_id"] == min(members)
        assert members == sorted(members)
        assert len(members) >= 2
        all_members.extend(members)
    assert len(all_members) == len(set(all_members)), "overlapping clusters"


def test_pagerank_copurchase_mass_and_order(spark):
    """Ranks are positive, bounded by the teleport floor from below,
    and the report is the global top-15 in (rank desc, part asc)
    order with a consistent vertex count."""
    fn, _ = PENDING_R16["q_graph_pagerank_copurchase"]
    got = fn(spark, SF_DIR).toPandas()
    assert len(got) == 15
    nv = got["n_vertices"].iloc[0]
    assert (got["n_vertices"] == nv).all() and nv > 15
    assert (got["pagerank"] >= round(0.15 / nv, 7) - 1e-9).all()
    pairs = list(zip(-got["pagerank"], got["part_key"]))
    assert pairs == sorted(pairs)


def test_pq_codes_cover_and_self_assign(spark):
    """Every vector gets one code per block (usage shares sum to 1 per
    block), codes stay inside the codebook, and each codeword's own
    source vector assigns to itself with zero distortion — the
    nearest-codeword argmin is exact, not approximate."""
    from pyspark.sql import functions as F

    from oraaud_kafka_spark.queries.pending import (
        _PQ_BLOCKS,
        _PQ_K,
        q_emb_pq_codes,
    )
    from oraaud_kafka_spark.tables import load

    got = q_emb_pq_codes(spark, SF_DIR).toPandas()
    assert len(got) == _PQ_BLOCKS * _PQ_K
    assert set(got["block"]) == set(range(_PQ_BLOCKS))
    assert got["code"].between(0, _PQ_K - 1).all()
    n_vecs = (
        load(spark, SF_DIR, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    per_block = got.groupby("block")["n_assigned"].sum()
    assert (per_block == n_vecs).all(), per_block
    shares = got.groupby("block")["usage_share"].sum()
    assert ((shares - 1.0).abs() < 1e-4).all(), shares
    # the codebook must not collapse: every block spreads its vectors
    # over several codewords (a flat S-curve here would mean the
    # data-derived codewords carry no signal)
    used = got[got["n_assigned"] > 0].groupby("block")["code"].nunique()
    assert (used >= 2).all(), used
    # used codewords carry finite distortion; unused rows stay NULL
    assert got.loc[got["n_assigned"] > 0, "avg_sqdist"].notna().all()
    assert got.loc[got["n_assigned"] == 0, "avg_sqdist"].isna().all()
