"""Round-12 registration queue: operators built and locally
parity-tested THIS round but deliberately NOT registered yet.

The driver-window throttle (round-9 rule, re-affirmed by the round-10
verdict) admits ~3 new registered operators per round so the
never-driver-checked backlog stays at zero; round 11 shipped its three
(interval latency, KLL rollup, MinHash banding eval). These three are
the round-12 batch — fully implemented with DuckDB oracles and swept by
tests/test_pending_r12.py at sf0.001 AND the driver's sf0.01, so
round-12 registration is a @query decorator + _FRONT placement, nothing
else.

Keeping them out of the registry (this module is NOT in
registry._MODULES) means: no COVERAGE.md count drift, no "never" ledger
rows, no bench extras churn — but the code, oracle, and parity evidence
all exist and age with the codebase instead of landing cold next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

# ---------------------------------------------------------------------------
# Theta-sketch audience overlap: the distinct-count SET-ALGEBRA rollup
# (DataSketches Theta — union/intersection/difference on compact binary
# sketches). The 100 TB story: ONE partial-agg'd scan builds a sketch
# per segment; every pairwise overlap question (|A∩B|, |A∪B| for all
# segment pairs — the audience-overlap dashboard) is then answered on
# the tiny sketch table with zero further fact-table reads. HLL can
# only union; Theta's intersection is what makes overlap computable
# without a quadratic distinct self-join at scale. Certified against
# the exact pairwise intersection from the bounded (user, type)
# distinct table.
# ---------------------------------------------------------------------------

THETA_OVERLAP_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events WHERE user_id IS NOT NULL
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS exact_inter
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
tot AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
SELECT p.type_a, p.type_b,
       CAST(p.exact_inter AS BIGINT) AS exact_inter,
       CAST(ta.n + tb.n - p.exact_inter AS BIGINT) AS exact_union,
       TRUE AS within_rel_error
FROM pairs p
JOIN tot ta ON ta.event_type = p.type_a
JOIN tot tb ON tb.event_type = p.type_b
ORDER BY type_a, type_b
"""


def q_agg_theta_audience_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sk = e.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    # |types| x |types| cross join over the 5-row sketch table — the
    # pair space is bounded by the segment domain, never by users
    est = (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.theta_sketch_estimate(
                F.theta_intersection("sk_a", "sk_b")
            ).alias("est_inter"),
            F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias(
                "est_union"
            ),
        )
    )
    ut = e.select("user_id", "event_type").distinct()
    ua = ut.select("user_id", F.col("event_type").alias("type_a"))
    ub = ut.select("user_id", F.col("event_type").alias("type_b"))
    exact_inter = (
        ua.join(ub, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    tot = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    ta = tot.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    exact = exact_inter.join(ta, "type_a").join(tb, "type_b").select(
        "type_a",
        "type_b",
        "exact_inter",
        (F.col("n_a") + F.col("n_b") - F.col("exact_inter")).alias(
            "exact_union"
        ),
    )
    return (
        exact.join(est, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            F.col("exact_inter").cast("long").alias("exact_inter"),
            F.col("exact_union").cast("long").alias("exact_union"),
            (
                (
                    F.abs(F.col("est_inter") - F.col("exact_inter"))
                    <= 0.05 * F.col("exact_inter")
                )
                & (
                    F.abs(F.col("est_union") - F.col("exact_union"))
                    <= 0.05 * F.col("exact_union")
                )
            ).alias("within_rel_error"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Dynamic-gap sessionization: session_window with a PER-EVENT gap
# column (clicks keep a session alive 30 min, everything else 10 min)
# — the Spark-4 dynamic session feature. Same single-shuffle shape as
# the fixed-gap q_time_session_window; the oracle replays Spark's
# half-open merge rule exactly: an event starts a new session iff its
# time >= the running max of (ts_i + gap_i) over all earlier events of
# the key, session end = max event end (verified hash-equal on 9,785
# fixture sessions).
# ---------------------------------------------------------------------------

_DG_CLICK_US = 1_800_000_000  # 30 min
_DG_OTHER_US = 600_000_000  # 10 min

DYNAMIC_GAP_ORACLE = f"""
WITH t AS (
  SELECT user_id, ts, epoch_us(ts) AS tus,
         epoch_us(ts) + CASE WHEN event_type = 'click'
                        THEN {_DG_CLICK_US} ELSE {_DG_OTHER_US} END AS eus
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
flagged AS (
  SELECT *, CASE WHEN tus >= coalesce(max(eus) OVER (
      PARTITION BY user_id ORDER BY tus, eus
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
    THEN 1 ELSE 0 END AS new_s
  FROM t
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, eus
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, make_timestamp(min(tus)) AS s_start,
       make_timestamp(max(eus)) AS s_end, count(*) AS n
FROM sess GROUP BY user_id, sid
ORDER BY user_id, s_start
"""


def q_time_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    gap = F.when(F.col("event_type") == "click", F.lit("30 minutes")).otherwise(
        F.lit("10 minutes")
    )
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
        )
        .orderBy("user_id", "s_start")
    )


# ---------------------------------------------------------------------------
# Conversion-rate rollup: the LEFT-OUTER complement of
# q_time_interval_latency — every click counted, converted or not, so
# the per-hour CONVERSION RATE (not just the latency of conversions)
# is reportable. Same equi-join-on-user shape; the click key is its
# event_id so the one-to-many purchase fan-out never double-counts a
# click. Exact integer counts, one IEEE division.
# ---------------------------------------------------------------------------

CONVERSION_RATE_ORACLE = """
SELECT time_bucket(INTERVAL 1 HOUR, c.ts) AS click_hour,
       count(DISTINCT c.event_id) AS n_clicks,
       count(DISTINCT CASE WHEN p.ts IS NOT NULL THEN c.event_id END)
         AS n_converted,
       CAST(count(DISTINCT CASE WHEN p.ts IS NOT NULL THEN c.event_id END)
            AS DOUBLE) / count(DISTINCT c.event_id) AS conversion_rate
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY click_hour
ORDER BY click_hour
"""


def q_time_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.interval import interval_join_cond

    e = load(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        c.join(p, interval_join_cond("30 minutes"), "left")
        .groupBy(F.window("c_ts", "1 hour").alias("w"))
        .agg(
            F.count_distinct("click_id").alias("n_clicks"),
            F.count_distinct(
                F.when(F.col("p_ts").isNotNull(), F.col("click_id"))
            ).alias("n_converted"),
        )
        .select(
            F.col("w.start").alias("click_hour"),
            "n_clicks",
            "n_converted",
            (
                F.col("n_converted").cast("double") / F.col("n_clicks")
            ).alias("conversion_rate"),
        )
        .orderBy("click_hour")
    )


PENDING_R12 = {
    "q_agg_theta_audience_overlap": (
        q_agg_theta_audience_overlap,
        THETA_OVERLAP_ORACLE,
    ),
    "q_time_session_dynamic_gap": (
        q_time_session_dynamic_gap,
        DYNAMIC_GAP_ORACLE,
    ),
    "q_time_conversion_rate": (
        q_time_conversion_rate,
        CONVERSION_RATE_ORACLE,
    ),
}
