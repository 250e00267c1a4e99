"""Set operations (SURVEY.md §2.2): UNION [ALL], INTERSECT [ALL],
EXCEPT [ALL]."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_UNION_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
ORDER BY c_custkey
"""


@query("q_set_union_distinct", oracle=_UNION_ORACLE)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return auto.union(rich).distinct().orderBy("c_custkey")


_UNIONALL_ORACLE = """
SELECT src, count(*) AS n FROM (
  SELECT 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 'open' AS src FROM orders WHERE o_orderstatus = 'O'
)
GROUP BY src
ORDER BY src
"""


@query("q_set_union_all", oracle=_UNIONALL_ORACLE)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src")
    )
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.lit("open").alias("src"))
    return (
        urgent.unionByName(open_)
        .groupBy("src")
        .agg(F.count("*").alias("n"))
        .orderBy("src")
    )


_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 200000
ORDER BY c_custkey
"""


@query("q_set_intersect", oracle=_INTERSECT_ORACLE)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big).orderBy("c_custkey")


_EXCEPT_ORACLE = """
SELECT n_nationkey FROM nation
EXCEPT
SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
ORDER BY n_nationkey
"""


@query("q_set_except", oracle=_EXCEPT_ORACLE)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").select("n_nationkey")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("n_nationkey"))
    )
    return n.exceptAll(c.distinct()).distinct().orderBy("n_nationkey")


# INTERSECT ALL / EXCEPT ALL keep duplicate multiplicity.
_IALL_ORACLE = """
SELECT k, count(*) AS n FROM (
  SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 25
  INTERSECT ALL
  SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.05
)
GROUP BY k
ORDER BY k
"""


@query("q_set_intersect_all", oracle=_IALL_ORACLE)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_discount") > 0.05).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b).groupBy("k").agg(F.count("*").alias("n")).orderBy("k")


_EALL_ORACLE = """
SELECT k, count(*) AS n FROM (
  SELECT o_custkey AS k FROM orders
  EXCEPT ALL
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY k
ORDER BY k
"""


@query("q_set_except_all", oracle=_EALL_ORACLE)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    all_ = o.select(F.col("o_custkey").alias("k"))
    fin = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return all_.exceptAll(fin).groupBy("k").agg(F.count("*").alias("n")).orderBy("k")
