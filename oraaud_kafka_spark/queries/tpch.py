"""TPC-H completion set: the decision-support shapes not yet covered by
the family modules — Q4 (priority checking via EXISTS), Q7 (two-nation
volume shipping), Q8 (national market share), Q10 (returned-item
reporting), Q15 (top supplier vs a scalar max), Q21 (waiting-orders
multi-EXISTS), Q9 (profit by nation/year, supply cost proxied from
p_retailprice). Together with Q1/Q3/Q5/Q6/Q12/Q13/Q14/Q17/Q18/Q19/Q22
in pricing/joins/filters/aggregates/subqueries, the engine runs every
TPC-H query expressible over the fixture schema (Q2/Q11/Q16/Q20 need
the partsupp table, which the fixtures do not ship; Q4/Q21's lateness
predicate is adapted to shipdate-vs-orderdate lag and Q9's supply cost
to a retail-price fraction since the fixture lacks commit/receipt
dates and partsupp — the join/EXISTS/aggregate shapes are unchanged).

Money math follows the repo's exact-decimal discipline (queries/__init__):
every sum runs over DECIMAL, one final correctly-rounded cast to double,
so both engines agree bitwise. Only DOMAIN-bounded dimensions (nation,
region) carry broadcast hints; supplier/customer/part grow linearly
with scale, so their joins carry no hint — AQE broadcasts them while
they are small and falls back to shuffle joins at 100 TB. The only
required shuffles are fact-fact joins on their keys and the final
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..registry import query
from ..tables import load
from . import DEC, DEC_MONEY, DEC_RATE, sql_to_dbl, to_dbl

_SQL_REV = (
    "sum(CAST(l_extendedprice AS DECIMAL(14,4))"
    " * (1 - CAST(l_discount AS DECIMAL(6,4))))"
)


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(DEC_MONEY) * (
        F.lit(1) - F.col("l_discount").cast(DEC_RATE)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking. Orders from one quarter that had at
# least one "late" line (shipdate > orderdate + 90 days — the fixture
# adaptation of commitdate < receiptdate), counted by priority. The
# EXISTS is a LEFT SEMI join on l_orderkey: lineitem never multiplies
# the order rows, and the aggregate is over order-cardinality.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_tpch_q4", oracle=_Q4_ORACLE)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, both directions, revenue by
# (supp_nation, cust_nation, ship year). Both nation dims broadcast
# after their single-value filters; the fact chain shuffles once on
# l_orderkey and the aggregate is partial-agg'd on a 2x2xyears key.
# ---------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_3", "NATION_7"

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_to_dbl(_SQL_REV)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         extract(year FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
      OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q_tpch_q7", oracle=_Q7_ORACLE)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == _Q7_N1)
                & (F.col("cust_nation") == _Q7_N2)
            )
            | (
                (F.col("supp_nation") == _Q7_N2)
                & (F.col("cust_nation") == _Q7_N1)
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _rev().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(to_dbl(F.sum("rev")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: of the STANDARD-type part volume sold
# into ASIA per order year, what fraction came from one nation's
# suppliers? Numerator and denominator are exact decimal sums over the
# SAME joined rows (one pass, conditional sum), so the share is one
# IEEE division of two bit-identical doubles.
# ---------------------------------------------------------------------------

_Q8_NATION = "NATION_5"
_Q8_REGION = "ASIA"
_Q8_TYPE = "STANDARD"

_Q8_ORACLE = f"""
SELECT o_year,
       {sql_to_dbl(f"sum(CASE WHEN nation = '{_Q8_NATION}' THEN volume ELSE CAST(0 AS DECIMAL(14,4)) END)")}
         AS nation_volume,
       {sql_to_dbl("sum(volume)")} AS total_volume,
       {sql_to_dbl(f"sum(CASE WHEN nation = '{_Q8_NATION}' THEN volume ELSE CAST(0 AS DECIMAL(14,4)) END)")}
         / {sql_to_dbl("sum(volume)")} AS mkt_share
FROM (
  SELECT extract(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(14,4))
           * (1 - CAST(l_discount AS DECIMAL(6,4))) AS volume,
         n1.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = '{_Q8_REGION}'
    AND p_type = '{_Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
GROUP BY o_year
ORDER BY o_year
"""


@query("q_tpch_q8", oracle=_Q8_ORACLE)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    volume = _rev()
    zero = F.lit(0).cast(DEC_MONEY) * F.lit(1).cast(DEC_RATE)
    joined = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    nation_vol = F.sum(
        F.when(F.col("nation") == _Q8_NATION, F.col("volume")).otherwise(zero)
    )
    total_vol = F.sum("volume")
    return (
        joined.groupBy("o_year")
        .agg(
            to_dbl(nation_vol).alias("nation_volume"),
            to_dbl(total_vol).alias("total_volume"),
            (to_dbl(nation_vol) / to_dbl(total_vol)).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: revenue lost to returns ('R' lines)
# per customer in one quarter, top 20. Global ranking is orderBy+limit
# -> TakeOrderedAndProject (per-partition top-k, driver merge of 20-row
# heaps), never a full sort.
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {sql_to_dbl(_SQL_REV)} AS revenue,
       c_acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q_tpch_q10", oracle=_Q10_ORACLE)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(to_dbl(F.sum(_rev())).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: quarterly revenue per supplier (the "revenue
# view"), then the suppliers matching the scalar max. The max-equality
# test runs on the EXACT DECIMAL revenue (cast to double only for
# output), so ties and the match itself are bit-safe on both engines —
# the float-equality trap the standard Q15 sets is structurally avoided.
# One fact aggregate + a 1-row broadcast scalar join.
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue_view AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(14,4))
             * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       {sql_to_dbl("total_rev")} AS total_revenue
FROM supplier JOIN revenue_view ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue_view)
ORDER BY s_suppkey
"""


@query("q_tpch_q15", oracle=_Q15_ORACLE)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue_view = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    max_rev = revenue_view.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue_view.join(
            broadcast(max_rev), F.col("total_rev") == F.col("max_rev")
        )
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", to_dbl(F.col("total_rev")).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: a supplier's line shipped
# late (shipdate > orderdate + 60 days — the fixture adaptation) on a
# multi-supplier order where NO other supplier shipped late. The
# EXISTS/NOT EXISTS pair becomes two aggregated flags over one
# order-level pass (any other supplier? any OTHER late supplier?) —
# one lineitem shuffle on l_orderkey instead of two correlated
# re-scans, then a semi-filtered count per supplier, top 20.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
order_stats AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supps
  FROM flagged GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM flagged
JOIN order_stats USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE is_late AND n_supps > 1
  AND n_late_supps = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("q_tpch_q21", oracle=_Q21_ORACLE)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    flagged = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    # order-level stats computed ONCE (no correlated re-scan): how many
    # distinct suppliers, and how many distinct LATE suppliers
    order_stats = flagged.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supps"),
    )
    waiting = (
        flagged.filter(F.col("is_late"))
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and order year. The fixture ships
# no partsupp, so supply cost is proxied as 60% of p_retailprice (the
# documented adaptation — the five-table join shape, the p_name-style
# part filter, and the per-(nation, year) profit aggregate are the
# standard Q9 plan). Profit stays exact: both factors cast to DECIMAL
# before the product and the sum, one correctly-rounded double at the
# end. part/supplier/nation broadcast; lineitem-orders is the only
# fact shuffle.
# ---------------------------------------------------------------------------

_Q9_TYPE_PREFIX = "PROMO"

_Q9_ORACLE = f"""
SELECT nation, o_year,
       {sql_to_dbl(
           "sum(CAST(l_extendedprice AS DECIMAL(14,4))"
           " * (1 - CAST(l_discount AS DECIMAL(6,4)))"
           " - CAST(l_quantity AS DECIMAL(14,4))"
           " * (CAST(p_retailprice AS DECIMAL(14,4)) * CAST(0.6 AS DECIMAL(6,4))))"
       )} AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey,
LATERAL (SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year) t
WHERE p_type LIKE '{_Q9_TYPE_PREFIX}%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q_tpch_q9", oracle=_Q9_ORACLE)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type").startswith(_Q9_TYPE_PREFIX)
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice").cast(DEC_MONEY) * (
        F.lit(1) - F.col("l_discount").cast(DEC_RATE)
    ) - F.col("l_quantity").cast(DEC_MONEY) * (
        F.col("p_retailprice").cast(DEC_MONEY) * F.lit(0.6).cast(DEC_RATE)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(to_dbl(F.sum("profit")).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )
