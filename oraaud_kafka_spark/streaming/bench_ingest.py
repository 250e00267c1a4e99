"""Ingest throughput measurement: synthetic audit-XML corpus through the
full pipeline (source -> decorate -> completeness gate -> sink), the
engine's counterpart of the reference's JMX bytes/elapsed counters
(CommonJobMgmt.java:22-24). The reference's design envelope is 32
workers x <=1 MB files at ~512 ms scheduling granularity — tens of MB/s
per host; this measures ours on the same kind of corpus.
"""

from __future__ import annotations

import shutil
import tempfile
import time
from pathlib import Path

from pyspark.sql import SparkSession

_RECORD = (
    "<AuditRecord><Audit_Type>1</Audit_Type><Session_Id>{sid}</Session_Id>"
    "<EntryId>{eid}</EntryId>"
    "<Extended_Timestamp>2024-05-04T13:50:15.000Z</Extended_Timestamp>"
    "<DB_User>USER{uid}</DB_User><OS_User>oracle</OS_User>"
    "<Userhost>dbhost{uid}</Userhost><Action>100</Action>"
    "<Returncode>0</Returncode><Scn>8397516</Scn>"
    "<Sql_Text>select col{eid} from t{sid} where id = {eid}</Sql_Text>"
    "</AuditRecord>"
)


def make_corpus(directory: str, n_files: int, records_per_file: int) -> int:
    """Write a deterministic synthetic corpus; returns total bytes."""
    total = 0
    d = Path(directory)
    for f in range(n_files):
        body = "".join(
            _RECORD.format(sid=f, eid=r, uid=f % 7) for r in range(records_per_file)
        )
        doc = f'<?xml version="1.0"?>\n<Audit>\n{body}\n</Audit>'
        p = d / f"orcl_ora_{10000 + f}_{f:04d}.xml"
        p.write_text(doc)
        total += len(doc)
    return total


def _noop_sink(batch_df, batch_id: int) -> None:
    # Materializes every output column JVM-side without the driver-side
    # collect a memory sink would add; a real deployment's Kafka sink is
    # likewise executor-side (network), never a driver funnel.
    batch_df.write.format("noop").mode("overwrite").save()


def _one_pass(
    spark: SparkSession, work: Path, tag: str, n_files: int, records_per_file: int
) -> dict:
    import tempfile as _tf

    from .ingest import build_ingest_stream, start_foreach_batch_sink

    watched = work / f"adump_{tag}"
    watched.mkdir()
    total_bytes = make_corpus(str(watched), n_files, records_per_file)
    df = build_ingest_stream(spark, str(watched), hostname="bench")
    t0 = time.perf_counter()
    q = start_foreach_batch_sink(
        df,
        _noop_sink,
        checkpoint_dir=_tf.mkdtemp(prefix=f"ckpt_{tag}_", dir=str(work)),
        available_now=True,
    )
    q.awaitTermination(600)
    # steady-state: sum of per-batch execution times from query progress —
    # the analog of the reference's JMX "cumulative transfer millis"
    # (CommonJobMgmt.java:24 measures per-file send time, not daemon
    # startup). File count is verified from the observe() node rather
    # than a driver-collected table.
    batch_ms = 0
    shipped = 0
    for p in q.recentProgress:
        if p.numInputRows > 0:
            batch_ms += p.durationMs["triggerExecution"]
            obs = (p.observedMetrics or {}).get("ingest_metrics")
            if obs is not None:
                shipped += obs["files"] or 0
    q.stop()
    elapsed = time.perf_counter() - t0
    assert shipped == n_files, f"shipped {shipped}/{n_files} files"
    return {"bytes": total_bytes, "elapsed": elapsed, "batch_ms": batch_ms}


def run_ingest_bench(
    spark: SparkSession,
    *,
    n_files: int = 64,
    records_per_file: int = 2800,
    passes: int = 2,
) -> dict:
    # defaults ≈ the reference's recommended max file size (~1 MB,
    # README.md:241): 64 x 1 MB ≈ 66 MB per pass
    """Returns {'ingest_files': N, 'ingest_mb': M, 'ingest_sec': s,
    'ingest_mbps': r, 'ingest_batch_sec': s, 'ingest_mbps_steady': r}.

    A tiny warm-up pass JIT-compiles the pipeline, then the best of
    ``passes`` full passes is reported — each pass writes a fresh corpus
    immediately before reading it, so single-pass numbers are noisy
    (dirty-page writeback competes with the measured read).
    """
    from .ingest import build_ingest_stream, start_foreach_batch_sink

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        warm = Path(work) / "warm"
        warm.mkdir()
        make_corpus(str(warm), 4, 50)
        wq = start_foreach_batch_sink(
            build_ingest_stream(spark, str(warm), hostname="warm"),
            _noop_sink,
            checkpoint_dir=str(Path(work) / "ckpt_warm"),
            available_now=True,
        )
        wq.awaitTermination(120)
        wq.stop()

        best = min(
            (
                _one_pass(spark, Path(work), str(i), n_files, records_per_file)
                for i in range(passes)
            ),
            key=lambda r: r["batch_ms"],
        )
        mb = best["bytes"] / 1e6
        batch_sec = best["batch_ms"] / 1000
        return {
            "ingest_files": n_files,
            "ingest_mb": round(mb, 2),
            "ingest_sec": round(best["elapsed"], 4),
            "ingest_mbps": round(mb / best["elapsed"], 2),
            "ingest_batch_sec": round(batch_sec, 4),
            "ingest_mbps_steady": round(mb / batch_sec, 2) if batch_sec else None,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
