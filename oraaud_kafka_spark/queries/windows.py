"""Window-function operators (SURVEY.md §2.2): ranking, analytic
(lag/lead/first/last), aggregates over row/range frames, top-k per group.

Every window spec carries a total order (explicit tie-breaker key) so
results are deterministic and comparable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.segmented import segmented_running_max
from ..registry import query
from ..tables import bounded_sort, checkpoint_sort, load
from . import DEC, to_dbl

_TOPK_ORACLE = """
SELECT c_mktsegment, rnk, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


@query("q_window_topk_per_group", oracle=_TOPK_ORACLE)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
        # NOT bounded_sort (round-14 A/B, 0.43 -> 0.53 s): coalesce(1)
        # narrows the whole post-exchange segment to one task, which
        # here is the ranking window over every order — the range sort
        # only re-samples the already-shuffled window input, cheaper
        .orderBy("c_mktsegment", "rnk")
    )


_RANKS_ORACLE = """
SELECT s_nationkey, s_suppkey, s_acctbal,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
ORDER BY s_nationkey, rnk
"""


@query("q_window_ranks", oracle=_RANKS_ORACLE)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    ).orderBy("s_nationkey", "rnk")


# lag/lead deltas; |delta| summed through decimal so the group totals are
# order-independent.
_LAG_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(CAST(round(sum(CAST(abs(delta) AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS total_abs_delta
FROM (
  SELECT event_type,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events
)
WHERE delta IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@query("q_window_lag_delta", oracle=_LAG_ORACLE)
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = (F.col("value") - F.lag("value").over(w)).alias("delta")
    return (
        e.select("event_type", delta)
        .filter(F.col("delta").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            to_dbl(F.sum(F.abs(F.col("delta")).cast(DEC))).alias("total_abs_delta"),
        )
        .orderBy("event_type")
    )


# Running total over an explicit ROWS frame. The per-row prefix sums are
# decimal-exact, so every output row is bit-identical to the oracle.
_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
"""


@query("q_window_running_total", oracle=_RUNNING_ORACLE)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


_MOVAVG_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
         / count(*) OVER w AS moving_avg_3
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


@query("q_window_moving_avg", oracle=_MOVAVG_ORACLE)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg_3"),
    ).orderBy("o_custkey", "o_orderkey")


_FIRSTLAST_ORACLE = """
SELECT DISTINCT s_nationkey,
       first_value(s_name) OVER w AS poorest,
       last_value(s_name) OVER w AS richest
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY s_nationkey
"""


@query("q_window_first_last", oracle=_FIRSTLAST_ORACLE)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy("s_acctbal", "s_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        s.select(
            "s_nationkey",
            F.first("s_name").over(w).alias("poorest"),
            F.last("s_name").over(w).alias("richest"),
        )
        .distinct()
        .orderBy("s_nationkey")
    )


_LEAD_ORACLE = """
SELECT user_id, event_id, event_type,
       lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
       date_diff('microsecond', ts,
            lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS us_to_next
FROM events
WHERE user_id < 5
ORDER BY user_id, event_id
"""


@query("q_window_lead_next", oracle=_LEAD_ORACLE)
def q_window_lead_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    next_ts = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(next_ts) - F.unix_micros(F.col("ts"))).alias("us_to_next"),
    ).orderBy("user_id", "event_id")


# RANGE frame over a numeric order key: every order's 30-day trailing
# revenue within its priority class. RANGE (value-based) frames include
# all peer rows of the current order-key value, so the sum is
# deterministic regardless of tie order — the frame semantics the judge
# of late-arriving trailing aggregates needs. Decimal-exact prefix sums
# keep rows bit-identical to the oracle.
_RANGE_ORACLE = """
SELECT o_orderkey, o_orderpriority, day_no,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_orderpriority ORDER BY day_no
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_30d_revenue
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_no
  FROM orders
  WHERE o_custkey < 200
)
ORDER BY o_orderkey
"""


@query("q_window_range_frame", oracle=_RANGE_ORACLE)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.withColumn("day_no", day_no)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "day_no",
            F.sum(F.col("o_totalprice").cast(DEC))
            .over(w)
            .cast("double")
            .alias("trailing_30d_revenue"),
        )
        .orderBy("o_orderkey")
    )


# Event-time RANGE frame: a per-user trailing 7-day sum ordered by the
# raw timestamp. Spark expresses interval frames over the epoch value
# (rangeBetween takes longs), so order by unix_micros with a
# microsecond-scaled bound — full timestamp precision, matching the
# oracle's native INTERVAL frame exactly even for same-second peer rows
# or pairs straddling the 7-day boundary by sub-second margins.
_TRANGE_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(sum(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS trailing_7d_value
FROM events
WHERE user_id < 40
ORDER BY user_id, ts, event_id
"""


@query("q_window_time_range_frame", oracle=_TRANGE_ORACLE)
def q_window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1_000_000, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").cast(DEC))
            .over(w)
            .cast("double")
            .alias("trailing_7d_value"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# Rolling correlation over a trailing 100-row frame — the time-series
# co-movement operator (value vs payload size per event type). All five
# moments are EXACT decimal window sums (order-independent at any
# parallelism), with the correlation assembled in identical double
# arithmetic on both engines, so even this windowed float statistic
# hash-compares. The frame orders on the UNIQUE event_id (the fixture
# lineitem PK is not unique, which would make frame contents
# order-dependent); one shuffle on event_type, and the frame is
# incremental state inside the window operator, not a per-row rescan.
_ROLLCORR_ORACLE = """
SELECT event_type, event_id, n_w,
       CASE WHEN n_w > 1 AND n_w * sxx - sx * sx > 0 AND n_w * syy - sy * sy > 0 THEN
         (n_w * sxy - sx * sy)
           / (sqrt(n_w * sxx - sx * sx) * sqrt(n_w * syy - sy * sy))
       END AS roll_corr
FROM (
  SELECT event_type, event_id,
         CAST(count(*) OVER w AS DOUBLE) AS n_w,
         CAST(CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER w, 4) AS DECIMAL(18,4)) AS DOUBLE) AS sx,
         CAST(CAST(round(sum(CAST(length(props) AS DECIMAL(18,4))) OVER w, 4) AS DECIMAL(18,4)) AS DOUBLE) AS sy,
         CAST(CAST(round(sum(CAST(value * length(props) AS DECIMAL(18,4))) OVER w, 4) AS DECIMAL(18,4)) AS DOUBLE) AS sxy,
         CAST(CAST(round(sum(CAST(value * value AS DECIMAL(18,4))) OVER w, 4) AS DECIMAL(18,4)) AS DOUBLE) AS sxx,
         CAST(CAST(round(sum(CAST(length(props) * length(props) AS DECIMAL(18,4))) OVER w, 4) AS DECIMAL(18,4)) AS DOUBLE) AS syy
  FROM events
  WHERE event_id < 5000
  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
)
ORDER BY event_type, event_id
"""


@query("q_window_rolling_corr", oracle=_ROLLCORR_ORACLE)
def q_window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(-99, Window.currentRow)
    )
    x = F.col("value")
    y = F.length("props")
    n_w = F.count("*").over(w).cast("double")
    sx = to_dbl(F.sum(x.cast(DEC)).over(w))
    sy = to_dbl(F.sum(y.cast(DEC)).over(w))
    sxy = to_dbl(F.sum((x * y).cast(DEC)).over(w))
    sxx = to_dbl(F.sum((x * x).cast(DEC)).over(w))
    syy = to_dbl(F.sum((y * y).cast(DEC)).over(w))
    corr = (n_w * sxy - sx * sy) / (
        F.sqrt(n_w * sxx - sx * sx) * F.sqrt(n_w * syy - sy * sy)
    )
    defined = (
        (n_w > 1)
        & (n_w * sxx - sx * sx > 0)
        & (n_w * syy - sy * sy > 0)
    )
    return e.select(
        "event_type",
        "event_id",
        n_w.alias("n_w"),
        F.when(defined, corr).alias("roll_corr"),
        # checkpoint_sort: don't re-run the 5-moment rolling window in
        # the range-bound sampling pass. Checkpointed frame: O(events)
        # narrow rows. Round-15 honest A/B (full recompute per rep):
        # keep 0.69 s vs plain orderBy 1.12 s — KEPT
    ).transform(lambda d: checkpoint_sort(d, "event_type", "event_id"))


# ---------------------------------------------------------------------------
# Distribution window functions — percent_rank / cume_dist / ntile —
# over a pinned (c_acctbal, c_custkey) total order per segment, which
# makes every one of them deterministic (percent_rank's (rank-1)/(n-1)
# divides exact integers; ntile's floor-split bucket assignment is a
# pure function of position). Completes the §2.2 window surface: rank/
# dense_rank/row_number live in q_window_ranks, frames in the
# range/rows queries; these are the quantile-position family.
# ---------------------------------------------------------------------------

_DIST_ORACLE = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_acctbal, c_custkey
"""


@query("q_window_distribution_ranks", oracle=_DIST_ORACLE)
def q_window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    ).orderBy("c_mktsegment", "c_acctbal", "c_custkey")


# ---------------------------------------------------------------------------
# Maximum drawdown per group — the running-max window classic (the
# risk metric every monitoring dashboard computes on a metric series:
# largest peak-to-trough drop so far). Series = order value in cents
# over the per-priority (o_orderdate, o_orderkey) total order;
# drawdown at a row = running max − current value, all exact int64 —
# max_drawdown ≡ max over pairs i≤j of (v_i − v_j) without the O(n²)
# pair scan. Scale shape: ONE window pass per partition (running max
# is streaming state of a single value — Spark's UnboundedPreceding
# MAX frame is O(1) per row) + a partial-agg'd per-group reduce; no
# self-join, nothing quadratic. The only doubles are the final /100
# denominations and the dd/peak share, identical operands both
# engines.
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH series AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(max(round(o_totalprice * 100)) OVER (
                PARTITION BY o_orderpriority
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS run_peak
  FROM orders
),
g AS (
  SELECT o_orderpriority,
         count(*) AS n_rows,
         CAST(max(run_peak) AS BIGINT) AS peak_cents,
         CAST(max(run_peak - cents) AS BIGINT) AS max_dd_cents
  FROM series GROUP BY o_orderpriority
)
SELECT o_orderpriority, n_rows,
       round(CAST(peak_cents AS DOUBLE) / 100, 6) AS peak_dollars,
       round(CAST(max_dd_cents AS DOUBLE) / 100, 6) AS max_drawdown_dollars,
       CASE WHEN peak_cents <> 0
            THEN round(CAST(max_dd_cents AS DOUBLE) / peak_cents, 6) END
         AS dd_share
FROM g
ORDER BY o_orderpriority
"""


@query("q_window_max_drawdown", oracle=_DRAWDOWN_ORACLE)
def q_window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest peak-to-trough drop of order value per priority over the
    (o_orderdate, o_orderkey) total order — running-max window minus
    current, exact in cents.

    Scale shape (round-10 re-shape): o_orderpriority has FIVE values, so
    partitioning the running-max window on it alone hands the whole
    table to 5 tasks at cluster scale. The running max is an associative
    prefix scan, so it segments on a date bucket exactly like
    q_events_concurrency's hour-local sweep: month-local running peak
    (window partitioned by (priority, month) — fine-grained, data-
    proportional parallelism) + per-month peak maxima prefix-merged
    within each priority (a window over the bounded priority x month
    domain, ~84 rows/priority for the 7-year order span), final
    run_peak = greatest(local, offset) — the shared
    operators/segmented.py helper (NULL semantics, the
    two-scans-beat-a-sort trade, and the null-safe joins are documented
    there once). Month bucketing respects the (o_orderdate, o_orderkey)
    order because month boundaries are date boundaries. The offset
    table is date-domain-bounded, hence the broadcast hint (see
    tests/test_broadcast_hints.py). The oracle keeps the plain
    per-priority window; the hash match proves the segmented
    decomposition exact."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    bucketed = o.select(
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        cents.alias("cents"),
        F.date_trunc("month", "o_orderdate").alias("bucket"),
    )
    series = segmented_running_max(
        bucketed,
        value="cents",
        order_cols=("o_orderdate", "o_orderkey"),
        bucket="bucket",
        partition=("o_orderpriority",),
        # priority x month domain is calendar-bounded, never row-bounded
        broadcast_offsets=True,
        out="run_peak_raw",
    ).select(
        "o_orderpriority",
        "cents",
        F.col("run_peak_raw").cast("bigint").alias("run_peak"),
    )
    g = series.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.max("run_peak").cast("bigint").alias("peak_cents"),
        F.max(F.col("run_peak") - F.col("cents"))
        .cast("bigint")
        .alias("max_dd_cents"),
    )
    return g.select(
        "o_orderpriority",
        "n_rows",
        F.round(F.col("peak_cents").cast("double") / 100, 6).alias(
            "peak_dollars"
        ),
        F.round(F.col("max_dd_cents").cast("double") / 100, 6).alias(
            "max_drawdown_dollars"
        ),
        # ANSI guard: an all-zero-price series has peak 0 — NULL share,
        # not DIVIDE_BY_ZERO (round-6 hazard class)
        F.when(
            F.col("peak_cents") != 0,
            F.round(
                F.col("max_dd_cents").cast("double") / F.col("peak_cents"),
                6,
            ),
        ).alias("dd_share"),
    ).orderBy("o_orderpriority")
