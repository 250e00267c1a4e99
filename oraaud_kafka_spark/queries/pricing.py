"""Flagship query: TPC-H Q1-style pricing summary on lineitem.

SURVEY.md §7 Phase 1 — scan -> filter on l_shipdate -> groupBy
(l_returnflag, l_linestatus) -> sums/avgs/count -> orderBy. Exercises
predicate pushdown (shipdate filter reaches the parquet scan), partial
aggregation (map-side combine before the shuffle) and whole-stage codegen;
the decimal cast is in the aggregate, so the scan stays columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, spread
from . import DEC, DEC_MONEY, DEC_RATE, sql_davg, sql_dsum, sql_to_dbl, to_dbl

CUTOFF = "1998-09-02 00:00:00"

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_to_dbl('sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))))')} AS sum_disc_price,
  {sql_to_dbl('sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4))))')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Narrow projection + filter FIRST (both reach the parquet scan),
    # then spread: the fixtures are single-row-group files, so without a
    # repartition the whole decimal-heavy partial aggregation runs on one
    # core. spread() no-ops when the scan is already wide (real cluster).
    li = spread(
        load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        )
        .filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
    )
    price = F.col("l_extendedprice").cast(DEC_MONEY)
    disc = F.col("l_discount").cast(DEC_RATE)
    tax = F.col("l_tax").cast(DEC_RATE)
    qty = F.col("l_quantity").cast(DEC)
    price18 = F.col("l_extendedprice").cast(DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            to_dbl(F.sum(qty)).alias("sum_qty"),
            to_dbl(F.sum(price18)).alias("sum_base_price"),
            to_dbl(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
            to_dbl(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))).alias(
                "sum_charge"
            ),
            (to_dbl(F.sum(qty)) / F.count("l_quantity")).alias("avg_qty"),
            (to_dbl(F.sum(price18)) / F.count("l_extendedprice")).alias("avg_price"),
            (
                to_dbl(F.sum(F.col("l_discount").cast(DEC))) / F.count("l_discount")
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# The same flagship expressed through the spark.sql() surface (temp views
# over the fixture tables) — proves the SQL API end-to-end under the same
# DuckDB oracle. Spark-side text mirrors the DataFrame version's exact
# decimal discipline (Spark's decimal narrowing rounds HALF_UP, matching
# to_dbl); the DuckDB oracle is shared with q1_pricing_summary.
_SPARK_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_charge,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / count(l_quantity) AS avg_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / count(l_extendedprice) AS avg_price,
  CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / count(l_discount) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q_sql_pricing_summary", oracle=_ORACLE)
def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SPARK_SQL)
