"""Audit-directory source: the Spark-native re-expression of the
reference's ingest front half (SURVEY.md §2.1 R-1..R-10).

Reference semantics -> Spark mapping:
- WatchService loop + backlog scan (OraaudKafka.java:79-131,
  CommonJobSingleton.java:85-96) -> one file source; each micro-batch
  lists new files, the first batch includes pre-existing ones.
- ``*.xml`` suffix filter (OraaudKafka.java:114) -> pathGlobFilter.
- whole-file read, newline-strip (KafkaJob.java:49-57, the commented-out
  append("\\n") at :54) -> wholetext=true + translate (single-pass char
  removal; ~30% cheaper than regexp_replace on ~1 MB payloads).
- key = hostname:file (KafkaJob.java:47, CommonJobSingleton.java:49)
  -> concat(lit(driver hostname), ':', input_file_name()).
- pid from ``*_<pid>_<ts>.xml`` (OraTrcNameHolder.java:34-35)
  -> regexp_extract on the file name.
- completeness gate endsWith("</Audit>") (KafkaJob.java:59) ->
  is_complete filter; incomplete files are NOT consumed this batch and,
  not being deleted, are retried by re-listing — the analog of the
  requeue at KafkaJob.java:81-88.
- locked-writer gate (R-6, OpenFilesIntf strategies): Spark's contract is
  immutable-once-visible files; the trigger interval plus the
  completeness predicate provide the equivalent "never ship a truncated
  file" guarantee without OS introspection.
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# OraTrcNameHolder.java:34-35 — pid is the token before the last '_'.
PID_PATTERN = r"_([0-9]+)_[^_/]*\.xml$"
COMPLETE_PATTERN = r"</Audit>\s*$"


def driver_hostname() -> str:
    """Captured once on the driver — same contract as the reference's
    hostname-at-startup (CommonJobSingleton.java:49, OsUtils.java:30-39);
    executor hostnames would fragment the key space."""
    return socket.gethostname()


def _decorate(df: DataFrame, hostname: str | None) -> DataFrame:
    host = hostname or driver_hostname()
    src_file = F.input_file_name()
    # is_complete is computed on the RAW value (rtrim + endsWith — same
    # semantics as rlike '</Audit>\s*$', KafkaJob.java:59) BEFORE the
    # newline-strip, so the downstream completeness filter runs a cheap
    # literal suffix match on the scan output and the ~1 MB translate
    # copy is evaluated once, only for rows that pass the gate. With the
    # old order (translate then rlike) Catalyst inlined translate into
    # the filter condition and every payload was copied twice.
    return (
        df.withColumn("src_file", src_file)
        .withColumn("src_host", F.lit(host))
        .withColumn("src_pid", F.regexp_extract(src_file, PID_PATTERN, 1))
        .withColumn("key", F.concat_ws(":", F.lit(host), src_file))
        .withColumn(
            "is_complete",
            F.endswith(F.rtrim(F.col("value")), F.lit("</Audit>")),
        )
        .withColumn("value", F.translate("value", "\n", ""))
    )


def read_audit_stream(
    spark: SparkSession,
    watched_path: str,
    *,
    hostname: str | None = None,
    max_files_per_trigger: int | None = None,
    clean_source: str | None = None,
    archive_dir: str | None = None,
) -> DataFrame:
    """Streaming whole-file source over an audit directory.

    ``clean_source='delete'`` reproduces R-15 (delete after the batch
    commits — the reference deletes after the producer ack,
    KafkaJob.java:71); 'archive' moves to ``archive_dir`` instead.
    """
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.xml")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
        if clean_source == "archive" and archive_dir:
            reader = reader.option("sourceArchiveDir", archive_dir)
    return _decorate(reader.load(watched_path), hostname)


def read_audit_batch(
    spark: SparkSession, watched_path: str, *, hostname: str | None = None
) -> DataFrame:
    """Batch variant (backfill / reprocessing path)."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.xml")
        .load(watched_path)
    )
    return _decorate(df, hostname)


def complete_only(df: DataFrame) -> DataFrame:
    """R-10: ship only well-formed files; the rest retry via re-listing."""
    return df.filter(F.col("is_complete"))


def rejects(df: DataFrame) -> DataFrame:
    """R-4 side-channel: records withheld by the completeness gate."""
    return df.filter(~F.col("is_complete"))
