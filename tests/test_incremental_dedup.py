"""Cross-run dedup: the signature_store_maintainer foreachBatch loop
must reproduce EXACTLY the registered q_dedup_incremental decisions
when fed the same docs in arrival order (corpus first, then the shard
in id-ordered batches), stay idempotent under at-least-once replay,
and keep the store append-only (a nightly batch writes O(batch), never
rewrites the standing shards)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from oraaud_kafka_spark.llm.dedup import (
    INCR_SHARD_MOD,
    INCR_SHARD_REM,
    q_dedup_incremental,
)
from oraaud_kafka_spark.streaming.analytics import (
    committed_decisions,
    signature_store_maintainer,
)
from oraaud_kafka_spark.tables import load

from .conftest import SF_DIR


def _splits(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    is_shard = (F.col("doc_id") % INCR_SHARD_MOD) == INCR_SHARD_REM
    corpus = d.filter(~is_shard)
    shard = d.filter(is_shard)
    mid = sorted(r.doc_id for r in shard.select("doc_id").collect())
    cut = mid[len(mid) // 2]
    return corpus, shard.filter(F.col("doc_id") < cut), shard.filter(
        F.col("doc_id") >= cut
    )


def _decisions_pdf(df):
    return (
        df.orderBy("doc_id")
        .toPandas()
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "n_candidates": "int64"})
    )


def test_maintainer_matches_registered_query(spark, tmp_path):
    corpus, shard1, shard2 = _splits(spark)
    base = str(tmp_path / "sigstore")
    apply_batch = signature_store_maintainer(base)
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    apply_batch(shard2, 2)
    got = _decisions_pdf(
        spark.read.parquet(
            os.path.join(base, "decisions_batch=1"),
            os.path.join(base, "decisions_batch=2"),
        )
    )
    want = _decisions_pdf(q_dedup_incremental(spark, SF_DIR))
    assert got.equals(want), f"\ngot:\n{got}\nwant:\n{want}"
    # the run found real duplicates, not a vacuous all-keep pass
    assert (want["action"] == "drop").any()
    assert (want["action"] == "keep").any()
    # append-only: three signature shards, no rewrite of earlier ones
    shards = sorted(
        p for p in os.listdir(base) if p.startswith("sigs_batch=")
    )
    assert shards == ["sigs_batch=0", "sigs_batch=1", "sigs_batch=2"]


def test_maintainer_replay_is_noop(spark, tmp_path):
    corpus, shard1, shard2 = _splits(spark)
    base = str(tmp_path / "sigstore")
    apply_batch = signature_store_maintainer(base)
    apply_batch(corpus, 0)
    # foreachBatch replays only the LAST batch (the one whose commit
    # may not have landed) — replay of 0 right after 0 must no-op
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    before = _decisions_pdf(committed_decisions(spark, base))
    apply_batch(shard1, 1)
    with open(os.path.join(base, "_committed")) as fh:
        state = json.load(fh)
    assert state == {"last_batch": 1, "shards": [0, 1]}
    assert _decisions_pdf(committed_decisions(spark, base)).equals(before)
    # continuation still works after the replays
    apply_batch(shard2, 2)
    got = _decisions_pdf(
        spark.read.parquet(
            os.path.join(base, "decisions_batch=1"),
            os.path.join(base, "decisions_batch=2"),
        )
    )
    assert got.equals(_decisions_pdf(q_dedup_incremental(spark, SF_DIR)))


def test_maintainer_rejects_foreign_checkpoint(spark, tmp_path):
    """A fresh checkpoint pointed at an existing store restarts batch
    ids at 0; treating those as replays would silently drop new docs —
    the maintainer must refuse loudly instead."""
    import pytest

    corpus, shard1, _ = _splits(spark)
    base = str(tmp_path / "sigstore")
    apply_batch = signature_store_maintainer(base)
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    with pytest.raises(ValueError, match="another checkpoint"):
        signature_store_maintainer(base)(corpus, 0)


def test_maintainer_over_real_stream(spark, tmp_path):
    """The wiring end-to-end: a file stream of (doc_id, text) JSON in
    arrival order through foreachBatch(signature_store_maintainer) must
    land the same committed decisions as the direct-call run."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    corpus, shard1, shard2 = _splits(spark)
    d = tmp_path / "docs_in"
    d.mkdir()
    base_t = 1_700_000_000
    for i, part in enumerate((corpus, shard1, shard2)):
        p = d / f"b{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"doc_id": r.doc_id, "text": r.text})
                for r in part.collect()
            )
        )
        os.utime(p, (base_t + i * 10, base_t + i * 10))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    base = str(tmp_path / "sigstore_stream")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .json(str(d))
    )
    q = (
        stream.writeStream.foreachBatch(signature_store_maintainer(base))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    with open(os.path.join(base, "_committed")) as fh:
        assert json.load(fh)["shards"] == [0, 1, 2]
    got = _decisions_pdf(
        committed_decisions(spark, base).filter(
            (F.col("doc_id") % INCR_SHARD_MOD) == INCR_SHARD_REM
        )
    )
    assert got.equals(_decisions_pdf(q_dedup_incremental(spark, SF_DIR)))
