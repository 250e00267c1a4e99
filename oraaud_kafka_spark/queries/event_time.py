"""Event-time operators in batch form (SURVEY.md §2.2 streaming kit):
tumbling/sliding/session windows, keyed dedup-keep-first. The same
expressions run under readStream with watermarks (see streaming/); here
they run on the batch events table so the DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from . import DEC, sql_dsum, to_dbl

_TUMBLE_ORACLE = f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
       event_type,
       count(*) AS n,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY w_start, event_type
ORDER BY w_start, event_type
"""


@query("q_time_tumbling_window", oracle=_TUMBLE_ORACLE)
def q_time_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            to_dbl(F.sum(F.col("value").cast(DEC))).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
        .orderBy("w_start", "event_type")
    )


# Sliding window 1h every 30min: each event lands in 2 windows. Oracle
# materializes the same two window-starts per event with unnest.
_SLIDE_ORACLE = """
SELECT w_start, count(*) AS n
FROM (
  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS w_start
  FROM events
)
GROUP BY w_start
ORDER BY w_start
"""


@query("q_time_sliding_window", oracle=_SLIDE_ORACLE)
def q_time_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
        .orderBy("w_start")
    )


# Session windows (30-minute gap). Spark's native session_window merges
# events whose gaps are < gap; the oracle reconstructs identical sessions
# with the classic lag/cumsum island technique.
_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


@query("q_time_session_window", oracle=_SESSION_ORACLE)
def q_time_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
    )


# Streaming-dedup semantics in batch: keep the FIRST event per
# (user_id, event_type) in event-time order — the deterministic analog of
# dropDuplicates on a stream.
_DEDUPFIRST_ORACLE = """
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
"""


@query("q_time_dedup_keep_first", oracle=_DEDUPFIRST_ORACLE)
def q_time_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


# Late-data accounting relative to a watermark horizon: how many events
# arrive out-of-order by more than 10 minutes per type (the batch view of
# what a watermark would drop).
_LATE_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       sum(CASE WHEN lateness >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END) AS n_late
FROM (
  SELECT event_type,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ts AS lateness
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


@query("q_time_late_data", oracle=_LATE_ORACLE)
def q_time_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lateness = F.max("ts").over(w).cast("long") - F.col("ts").cast("long")
    return (
        e.select("event_type", lateness.alias("lateness_s"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("lateness_s") >= 600, 1).otherwise(0)).alias("n_late"),
        )
        .orderBy("event_type")
    )
