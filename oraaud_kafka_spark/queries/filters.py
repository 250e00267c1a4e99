"""Projection / filter / predicate operators (SURVEY.md §2.2).

All predicates are expressed declaratively so Catalyst pushes them into
the parquet scan (verify: .explain shows PushedFilters) and prunes
columns (ReadSchema lists only projected columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from . import DEC, sql_dsum, to_dbl

_PRED_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_discount < 0.08
"""


@query("q_filter_predicates", oracle=_PRED_ORACLE)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") < 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


_LIKE_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM orders
WHERE (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '%MEDIUM%')
  AND o_orderstatus <> 'P'
  AND o_totalprice > 150000
"""


@query("q_filter_like", oracle=_LIKE_ORACLE)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("%MEDIUM%"))
        & (F.col("o_orderstatus") != "P")
        & (F.col("o_totalprice") > 150000)
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


_REGEX_ORACLE = r"""
SELECT p_partkey, p_name,
       regexp_extract(p_name, '^(\w+) (\w+)$', 2) AS noun
FROM part
WHERE regexp_matches(p_name, '^(cold|small) ')
"""


@query("q_filter_regex", oracle=_REGEX_ORACLE)
def q_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike(r"^(cold|small) ")).select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 2).alias("noun"),
    )


_CASE_ORACLE = f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END AS price_band,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY price_band
ORDER BY price_band
"""


@query("q_filter_case_when", oracle=_CASE_ORACLE)
def q_filter_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("price_band")
    )
    return (
        o.groupBy(band)
        .agg(
            F.count("*").alias("n_orders"),
            to_dbl(F.sum(F.col("o_totalprice").cast(DEC))).alias("total"),
        )
        .orderBy("price_band")
    )


_NULL_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n,
       count(nullif(sign(c_acctbal), -1)) AS n_nonneg,
       CAST(sum(CASE WHEN coalesce(nullif(c_acctbal, 0.0), -1.0) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_or_zero
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_filter_null_logic", oracle=_NULL_ORACLE)
def q_filter_null_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.count(F.nullif(F.signum(bal), F.lit(-1.0))).alias("n_nonneg"),
            F.sum(
                F.when(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)) < 0, 1).otherwise(0)
            ).alias("n_neg_or_zero"),
        )
        .orderBy("c_mktsegment")
    )


# TPC-H Q19 shape: OR-of-ANDs disjunctive predicate across a
# fact×dim join. The scale-relevant Catalyst behavior: the common
# conjuncts (quantity/size bounds) are extracted from the disjunction
# (CNF conversion) and pushed into BOTH parquet scans, and the part
# side broadcasts — so the disjunction is evaluated only on the
# pre-filtered joined rows, never as a post-join residual over the
# full fact table.
_DISJ_ORACLE = f"""
SELECT count(*) AS n_lines,
       {sql_dsum('l_extendedprice')} AS gross_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 20 AND 40)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 25 AND 50
       AND l_quantity BETWEEN 35 AND 50)
"""


@query("q_filter_disjunctive", oracle=_DISJ_ORACLE)
def q_filter_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    arm = [
        ("Brand#1", (1, 15), (1, 20)),
        ("Brand#3", (10, 30), (20, 40)),
        ("Brand#5", (25, 50), (35, 50)),
    ]
    disj = None
    for brand, (slo, shi), (qlo, qhi) in arm:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        disj = c if disj is None else (disj | c)
    return (
        # no hint on part (scale-growing); AQE broadcasts when small
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(disj)
        .agg(
            F.count("*").alias("n_lines"),
            to_dbl(F.sum(F.col("l_extendedprice").cast(DEC))).alias("gross_revenue"),
        )
    )
