"""Sorts / limits / top-k (SURVEY.md §2.2).

Global top-k compiles to TakeOrderedAndProject (per-partition heap + driver
merge of k rows — no full sort, no shuffle of the full data), which is the
shape that survives 100 TB. Every ordering carries a unique tie-breaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_TOP10_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("q_sort_top10_global", oracle=_TOP10_ORACLE)
def q_sort_top10_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# Multi-key sort with NULLS LAST on a derived nullable column.
_NULLSORT_ORACLE = """
SELECT c_custkey, c_mktsegment,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal
FROM customer
WHERE c_custkey < 200
ORDER BY pos_bal DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
LIMIT 50
"""


@query("q_sort_multi_nulls", oracle=_NULLSORT_ORACLE)
def q_sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    pos_bal = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return (
        c.select("c_custkey", "c_mktsegment", pos_bal.alias("pos_bal"))
        .orderBy(
            F.col("pos_bal").desc_nulls_last(),
            F.col("c_mktsegment").asc(),
            F.col("c_custkey").asc(),
        )
        .limit(50)
    )


# ORDER BY an expression + LIMIT with OFFSET-free pagination semantics.
_EXPR_ORACLE = """
SELECT p_partkey, p_name, p_size, p_retailprice,
       p_retailprice / greatest(p_size, 1) AS price_per_size
FROM part
ORDER BY price_per_size DESC, p_partkey
LIMIT 25
"""


@query("q_sort_by_expression", oracle=_EXPR_ORACLE)
def q_sort_by_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    pps = (F.col("p_retailprice") / F.greatest(F.col("p_size"), F.lit(1))).alias(
        "price_per_size"
    )
    return (
        p.select("p_partkey", "p_name", "p_size", "p_retailprice", pps)
        .orderBy(F.col("price_per_size").desc(), F.col("p_partkey"))
        .limit(25)
    )
