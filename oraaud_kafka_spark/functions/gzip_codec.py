"""Gzip codec parity with the reference's GzipUtil
(/root/reference/src/main/java/eu/solutions/a2/utils/GzipUtil.java:27-70):
compress, decompress, and magic-byte sniff.

Spark-first shape: Arrow-batched pandas UDFs (a per-row Python UDF would
be 10-100x slower on the 100 TB path). Compression uses mtime=0 so output
bytes are deterministic — required for at-least-once dedup downstream.

The Kafka path does NOT use these: wire compression is the producer's
``compression.type=gzip`` pass-through (KafkaSingleton.java:108-114 →
option("kafka.compression.type", "gzip")). These UDFs implement the
KINESIS payload path (KinesisJob.java:66-73: gzip only above a size
threshold, default 512 B).
"""

from __future__ import annotations

import gzip as _gzip

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

GZIP_MAGIC = b"\x1f\x8b"
# KinesisSingleton.java:36 — default a2.kinesis.file.size.threshold
DEFAULT_THRESHOLD = 512


# Return types are DataType instances (not DDL strings) so decorating at
# import time needs no active SparkSession.
@pandas_udf(BinaryType())
def gzip_compress(data: pd.Series) -> pd.Series:
    """Unconditional gzip (GzipUtil.compress). Deterministic (mtime=0)."""
    return data.map(
        lambda b: _gzip.compress(b, mtime=0) if b is not None else None
    )


@pandas_udf(BinaryType())
def gzip_decompress(data: pd.Series) -> pd.Series:
    """Gzip-sniffing decompress (GzipUtil.decompress + isCompressed):
    payloads without the 1F 8B magic pass through unchanged."""

    def _d(b: bytes | None) -> bytes | None:
        if b is None:
            return None
        return _gzip.decompress(bytes(b)) if bytes(b)[:2] == GZIP_MAGIC else bytes(b)

    return data.map(_d)


def is_gzip(col):
    """Magic-byte predicate as a JVM expression (no Python):
    GzipUtil.isCompressed(byte[]) equivalent."""
    return F.substring(col, 1, 2) == F.lit(GZIP_MAGIC)


def conditional_gzip(value_col, threshold: int = DEFAULT_THRESHOLD):
    """KinesisJob.java:66-73 semantics: gzip the utf-8 payload only when
    it exceeds ``threshold`` bytes, else raw bytes."""
    raw = F.encode(value_col, "utf-8")
    return F.when(
        F.octet_length(raw) > threshold, gzip_compress(raw)
    ).otherwise(raw)
