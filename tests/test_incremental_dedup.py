"""Cross-run dedup: the signature_store_maintainer foreachBatch loop
must reproduce EXACTLY the registered q_dedup_incremental decisions
when fed the same docs in arrival order (corpus first, then the shard
in id-ordered batches) with the rule's membership predicate, stay
idempotent under at-least-once replay, reject foreign checkpoints by
CONTENT (not just id heuristics), keep the store append-only between
compactions, and compact without changing a single decision byte.

The parity sweep runs at sf0.001 AND the driver's sf0.01 — the latter
is where cross-batch shard->shard near-dup pairs actually exist (the
round-12 advice case: a shard doc whose nearest dup is a shard doc
from an earlier micro-batch), so the dup_src labeling is exercised,
not vacuously green."""

from __future__ import annotations

import json
import os

import pytest
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

from .conftest import SF_DIR, SF_DIR_CORRECTNESS


def _rule_pred(c):
    """The registered rule's corpus-membership classifier."""
    return (c % INCR_SHARD_MOD) != INCR_SHARD_REM


def _splits(spark, sf_dir=SF_DIR):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
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


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_CORRECTNESS])
def test_maintainer_matches_registered_query(spark, tmp_path, sf_dir):
    corpus, shard1, shard2 = _splits(spark, sf_dir)
    base = str(tmp_path / "sigstore")
    apply_batch = signature_store_maintainer(base, corpus_pred=_rule_pred)
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    apply_batch(shard2, 2)
    got = _decisions_pdf(
        spark.read.parquet(
            os.path.join(base, "decisions_batch=1"),
            os.path.join(base, "decisions_batch=2"),
        )
    )
    want = _decisions_pdf(q_dedup_incremental(spark, sf_dir))
    assert got.equals(want), f"\ngot:\n{got}\nwant:\n{want}"
    # the run found real duplicates, not a vacuous all-keep pass
    assert (want["action"] == "drop").any()
    assert (want["action"] == "keep").any()
    # append-only: three signature shards, no rewrite of earlier ones
    shards = sorted(
        p for p in os.listdir(base) if p.startswith("sigs_batch=")
    )
    assert shards == ["sigs_batch=0", "sigs_batch=1", "sigs_batch=2"]


def test_sf001_exercises_cross_batch_shard_labels(spark, tmp_path):
    """The sf0.01 parity above must cover the case the predicate
    exists for: a batch-2 shard doc whose dup_of sits in batch 1
    (same logical shard, earlier micro-batch). Pin its presence so a
    fixture regen can't silently turn the sweep vacuous again — and
    pin that the DEFAULT batch-origin mode labels exactly those rows
    'corpus' (its documented each-batch-is-a-run semantics)."""
    _, shard1, _ = _splits(spark, SF_DIR_CORRECTNESS)
    cut_ids = {r.doc_id for r in shard1.select("doc_id").collect()}
    want = _decisions_pdf(q_dedup_incremental(spark, SF_DIR_CORRECTNESS))
    cross = want[
        (want["dup_src"] == "shard")
        & want["dup_of"].isin(cut_ids)
        & ~want["doc_id"].isin(cut_ids)
    ]
    assert len(cross) > 0, (
        "sf0.01 fixture no longer contains a cross-batch shard match; "
        "the maintainer parity sweep is vacuous for dup_src"
    )
    corpus, shard1, shard2 = _splits(spark, SF_DIR_CORRECTNESS)
    base = str(tmp_path / "sigstore_default")
    apply_batch = signature_store_maintainer(base)  # batch-origin mode
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    apply_batch(shard2, 2)
    got = _decisions_pdf(
        spark.read.parquet(os.path.join(base, "decisions_batch=2"))
    )
    got_cross = got[got["doc_id"].isin(set(cross["doc_id"]))]
    assert (got_cross["dup_src"] == "corpus").all(), got_cross
    # action and candidate counts are classification-independent
    merged = got.merge(want, on="doc_id", suffixes=("_got", "_want"))
    assert (merged["action_got"] == merged["action_want"]).all()
    assert (
        merged["n_candidates_got"] == merged["n_candidates_want"]
    ).all()


def test_maintainer_replay_is_noop(spark, tmp_path):
    corpus, shard1, shard2 = _splits(spark)
    base = str(tmp_path / "sigstore")
    apply_batch = signature_store_maintainer(base, corpus_pred=_rule_pred)
    apply_batch(corpus, 0)
    # foreachBatch replays only the LAST batch (the one whose commit
    # may not have landed) — replay of 0 right after 0 must no-op
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    before = _decisions_pdf(committed_decisions(spark, base))
    apply_batch(shard1, 1)
    with open(os.path.join(base, "_committed")) as fh:
        state = json.load(fh)
    assert state["last_batch"] == 1 and state["shards"] == [0, 1]
    assert state["sig_dirs"] == ["sigs_batch=0", "sigs_batch=1"]
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
    corpus, shard1, _ = _splits(spark)
    base = str(tmp_path / "sigstore")
    apply_batch = signature_store_maintainer(base)
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    with pytest.raises(ValueError, match="another checkpoint"):
        signature_store_maintainer(base)(corpus, 0)


def test_maintainer_rejects_foreign_checkpoint_by_content(spark, tmp_path):
    """The round-12 advice hole: a store whose ONLY committed batch is
    0 (live == 0) used to swallow a foreign checkpoint's batch 0 as a
    replay, silently dropping those documents' decisions. The replay
    guard now fingerprints the incoming rows against the committed
    decision shard: different docs under a replayed id raise; a
    genuine at-least-once replay (identical rows) still no-ops."""
    corpus, shard1, _ = _splits(spark)
    base = str(tmp_path / "sigstore")
    apply_batch = signature_store_maintainer(base)
    apply_batch(corpus, 0)
    # identical content replay: fine, even from a rebuilt callback
    signature_store_maintainer(base)(corpus, 0)
    with open(os.path.join(base, "_committed")) as fh:
        assert json.load(fh)["last_batch"] == 0
    # different content under the committed id 0: foreign, loud
    with pytest.raises(ValueError, match="another checkpoint"):
        signature_store_maintainer(base)(shard1, 0)


def test_maintainer_compaction_preserves_decisions(spark, tmp_path):
    """Mid-stream compaction (compact_every=2) must leave every
    decision byte-identical to the uncompacted run AND the registered
    query, collapse the standing read to one directory, and defer
    deleting superseded shards for one full commit cycle."""
    corpus, shard1, shard2 = _splits(spark)
    base = str(tmp_path / "sigstore_compact")
    apply_batch = signature_store_maintainer(
        base, corpus_pred=_rule_pred, compact_every=2
    )
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)  # 2 shards -> compacts into sigs_compact=1
    with open(os.path.join(base, "_committed")) as fh:
        state = json.load(fh)
    assert state["sig_dirs"] == ["sigs_compact=1"]
    assert state["garbage"] == ["sigs_batch=0", "sigs_batch=1"]
    # superseded dirs survive until the NEXT commit (in-flight readers)
    assert os.path.isdir(os.path.join(base, "sigs_batch=0"))
    apply_batch(shard2, 2)
    assert not os.path.exists(os.path.join(base, "sigs_batch=0"))
    assert not os.path.exists(os.path.join(base, "sigs_batch=1"))
    # decisions byte-equal the registered one-shot rule despite batch 2
    # reading compacted standing signatures
    got = _decisions_pdf(
        spark.read.parquet(
            os.path.join(base, "decisions_batch=1"),
            os.path.join(base, "decisions_batch=2"),
        )
    )
    assert got.equals(_decisions_pdf(q_dedup_incremental(spark, SF_DIR)))
    # replay after compaction still no-ops (content check reads the
    # decision shard, which compaction never touches)
    apply_batch(shard2, 2)
    assert got.equals(
        _decisions_pdf(
            spark.read.parquet(
                os.path.join(base, "decisions_batch=1"),
                os.path.join(base, "decisions_batch=2"),
            )
        )
    )


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
        stream.writeStream.foreachBatch(
            signature_store_maintainer(base, corpus_pred=_rule_pred)
        )
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


def test_sig_store_sweeps_crash_leaked_dirs(spark, tmp_path):
    """A crash between a past commit's marker replace and its prune
    leaves superseded sigs_batch=*/sigs_compact=* dirs referenced by
    nothing (neither sig_dirs nor garbage); the list-based delete would
    orphan them forever. The commit-time sweep collects them while the
    live shards and the one-cycle grace list survive."""
    corpus, shard1, shard2 = _splits(spark)
    base = str(tmp_path / "sigstore_sweep")
    apply_batch = signature_store_maintainer(base, corpus_pred=_rule_pred)
    apply_batch(corpus, 0)
    apply_batch(shard1, 1)
    for name in ("sigs_batch=9999", "sigs_compact=9998"):
        leaked = os.path.join(base, name)
        os.makedirs(leaked)
        with open(os.path.join(leaked, "part-0.parquet"), "w") as fh:
            fh.write("leak")
    apply_batch(shard2, 2)
    with open(os.path.join(base, "_committed")) as fh:
        state = json.load(fh)
    on_disk = {
        p for p in os.listdir(base)
        if p.startswith(("sigs_batch=", "sigs_compact="))
    }
    assert on_disk == set(state["sig_dirs"]) | set(state["garbage"])
    assert "sigs_batch=9999" not in on_disk
    assert "sigs_compact=9998" not in on_disk
    # decisions unaffected by the sweep (committed_decisions spans all
    # batches; the registered query reports the shard only — compare
    # the overlap by doc_id)
    got = _decisions_pdf(committed_decisions(spark, base))
    want = _decisions_pdf(q_dedup_incremental(spark, SF_DIR))
    merged = got.merge(want, on="doc_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (merged["action_got"] == merged["action_want"]).all()
