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


def run_ingest_bench(
    spark: SparkSession, *, n_files: int = 64, records_per_file: int = 2800
) -> dict:
    # defaults ≈ the reference's recommended max file size (~1 MB,
    # README.md:241): 64 x 1 MB ≈ 66 MB per pass
    """Returns {'ingest_files': N, 'ingest_mb': M, 'ingest_sec': s,
    'ingest_mbps': r} for one availableNow pass over a fresh corpus."""
    from .ingest import build_ingest_stream, start_memory_sink

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        watched = Path(work) / "adump"
        watched.mkdir()
        total_bytes = make_corpus(str(watched), n_files, records_per_file)
        df = build_ingest_stream(spark, str(watched), hostname="bench")
        t0 = time.perf_counter()
        q = start_memory_sink(df, "ingest_bench", available_now=True)
        q.awaitTermination(600)
        q.stop()
        elapsed = time.perf_counter() - t0
        n = spark.table("ingest_bench").count()
        assert n == n_files, f"shipped {n}/{n_files} files"
        mb = total_bytes / 1e6
        return {
            "ingest_files": n_files,
            "ingest_mb": round(mb, 2),
            "ingest_sec": round(elapsed, 4),
            "ingest_mbps": round(mb / elapsed, 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
