"""Incremental duplicate-cluster maintenance: the
cluster_store_maintainer foreachBatch loop must land EXACTLY the
pending batch q_dedup_cluster_cc's cluster table over every doc seen —
for ANY batch split, since connected components are order-free — stay
idempotent under at-least-once replay, reject foreign checkpoints by
content, and retain exactly one superseded label version for in-flight
readers. The parity sweep runs at sf0.001 AND the driver's sf0.01."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from oraaud_kafka_spark.queries.pending import q_dedup_cluster_cc
from oraaud_kafka_spark.streaming.analytics import (
    cluster_store_maintainer,
    committed_clusters,
)
from oraaud_kafka_spark.tables import load

from .conftest import SF_DIR, SF_DIR_CORRECTNESS


def _clusters_pdf(df):
    pdf = (
        df.orderBy(F.desc("n_docs"), "cluster_id")
        .toPandas()
        .reset_index(drop=True)
        .astype({"cluster_id": "int64", "n_docs": "int64",
                 "n_dropped": "int64"})
    )
    pdf["doc_ids"] = pdf["doc_ids"].apply(list)
    return pdf


def _batches(spark, sf_dir, mode: str):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    if mode == "ranges":
        mx = d.agg(F.max("doc_id")).collect()[0][0]
        c1, c2 = mx // 3, 2 * mx // 3
        return (
            d.filter(F.col("doc_id") <= c1),
            d.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
            d.filter(F.col("doc_id") > c2),
        )
    return tuple(
        d.filter(F.col("doc_id") % 3 == r) for r in range(3)
    )


@pytest.mark.parametrize(
    "sf_dir,mode",
    [(SF_DIR, "ranges"), (SF_DIR, "mod"), (SF_DIR_CORRECTNESS, "ranges")],
)
def test_maintained_clusters_match_batch_cc(spark, tmp_path, sf_dir, mode):
    base = str(tmp_path / "clusterstore")
    apply_batch = cluster_store_maintainer(base)
    for i, part in enumerate(_batches(spark, sf_dir, mode)):
        apply_batch(part, i)
    got = _clusters_pdf(committed_clusters(spark, base))
    want = _clusters_pdf(q_dedup_cluster_cc(spark, sf_dir))
    assert got.equals(want), f"\ngot:\n{got}\nwant:\n{want}"
    assert len(want) > 0
    # label canonicality rides the parity, but pin it explicitly
    for _, row in got.iterrows():
        assert row["cluster_id"] == min(row["doc_ids"])


def test_cluster_replay_is_noop_and_retention(spark, tmp_path):
    b0, b1, b2 = _batches(spark, SF_DIR, "ranges")
    base = str(tmp_path / "clusterstore")
    apply_batch = cluster_store_maintainer(base)
    apply_batch(b0, 0)
    apply_batch(b0, 0)  # immediate replay
    apply_batch(b1, 1)
    before = _clusters_pdf(committed_clusters(spark, base))
    apply_batch(b1, 1)  # replay of the last committed batch
    with open(os.path.join(base, "_committed")) as fh:
        state = json.load(fh)
    assert state["last_batch"] == 1 and state["shards"] == [0, 1]
    assert _clusters_pdf(committed_clusters(spark, base)).equals(before)
    apply_batch(b2, 2)
    # exactly the live + immediately superseded label versions remain
    versions = sorted(
        p for p in os.listdir(base) if p.startswith("labels_v=")
    )
    assert versions == ["labels_v=1", "labels_v=2"]
    got = _clusters_pdf(committed_clusters(spark, base))
    assert got.equals(_clusters_pdf(q_dedup_cluster_cc(spark, SF_DIR)))


def test_cluster_store_rejects_foreign_checkpoint(spark, tmp_path):
    """A reused batch id whose rows differ from the committed
    fingerprint is a foreign checkpoint — loud, even when the store
    has only batch 0 (the live-batch-only guard's blind spot)."""
    b0, b1, _ = _batches(spark, SF_DIR, "ranges")
    base = str(tmp_path / "clusterstore")
    cluster_store_maintainer(base)(b0, 0)
    # identical content replay from a rebuilt callback: no-op
    cluster_store_maintainer(base)(b0, 0)
    with pytest.raises(ValueError, match="another checkpoint"):
        cluster_store_maintainer(base)(b1, 0)


def test_cluster_store_sweeps_crash_leaked_label_versions(spark, tmp_path):
    """A crash between a past commit's marker replace and its prune
    leaves a superseded labels_v dir referenced by nothing; the
    list-based delete would orphan it forever. The commit-time sweep
    collects it while retaining the live + one-cycle-grace versions."""
    b0, b1, b2 = _batches(spark, SF_DIR, "ranges")
    base = str(tmp_path / "clusterstore")
    apply_batch = cluster_store_maintainer(base)
    apply_batch(b0, 0)
    apply_batch(b1, 1)
    # simulate the crash-leaked dir: an old version nothing references
    leaked = os.path.join(base, "labels_v=9999")
    os.makedirs(leaked)
    with open(os.path.join(leaked, "part-0.parquet"), "w") as fh:
        fh.write("leak")
    apply_batch(b2, 2)
    versions = sorted(
        p for p in os.listdir(base) if p.startswith("labels_v=")
    )
    assert versions == ["labels_v=1", "labels_v=2"]
    got = _clusters_pdf(committed_clusters(spark, base))
    assert got.equals(_clusters_pdf(q_dedup_cluster_cc(spark, SF_DIR)))


def test_pointer_jump_cc_converges_past_the_old_round_budget(spark):
    """The round-13 advisor finding, pinned: a 300-node path graph has
    quotient diameter 299 — the old fixed-6-round loop would have
    returned split labels for it. The fixpoint loop must converge
    (every node labeled with the global min) and the exhaustion guard
    must RAISE, never return split components."""
    import pytest as _pytest

    from oraaud_kafka_spark.operators.components import (
        min_label_cc_pointer_jump,
    )

    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["qu", "qv"]
    )
    qdir = edges.unionByName(
        edges.selectExpr("qv as qu", "qu as qv")
    ).localCheckpoint(eager=True)
    got = min_label_cc_pointer_jump(qdir).toPandas()
    assert len(got) == n
    assert (got["lbl"] == 0).all(), got[got["lbl"] != 0].head()
    # a hub graph converges too (diameter 2)
    star = spark.createDataFrame(
        [(500, 500 + i) for i in range(1, 20)], ["qu", "qv"]
    )
    sdir = star.unionByName(star.selectExpr("qv as qu", "qu as qv"))
    sgot = min_label_cc_pointer_jump(sdir.localCheckpoint(eager=True))
    assert {r.lbl for r in sgot.collect()} == {500}
    # exhaustion raises instead of silently splitting
    with _pytest.raises(RuntimeError, match="fixpoint"):
        min_label_cc_pointer_jump(qdir, max_rounds=2)
