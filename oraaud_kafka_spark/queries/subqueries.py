"""Subquery surface (SURVEY.md §4.2: Catalyst's decorrelation is a
freebie — these queries prove the engine exposes it): scalar subquery,
correlated EXISTS / NOT EXISTS, IN, and a correlated scalar aggregate.
Written in SQL against registered temp views, the shape a user migrating
SQL workloads brings. Catalyst rewrites every one to a join (semi, anti,
or aggregated-left) — no per-row re-execution, which is what makes them
usable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load
from . import sql_davg, sql_dsum

_VIEWS = ("customer", "orders", "supplier", "nation", "lineitem", "part")


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in _VIEWS:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# Scalar subquery: compare each supplier to the global mean balance.
_SCALAR_SQL = f"""
SELECT s_nationkey, count(*) AS n_above
FROM supplier
WHERE s_acctbal > (SELECT {sql_davg('s_acctbal')} FROM supplier)
GROUP BY s_nationkey
ORDER BY s_nationkey
"""

_SCALAR_ORACLE = _SCALAR_SQL


@query("q_subquery_scalar", oracle=_SCALAR_ORACLE)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


# Correlated EXISTS: customers with at least one urgent order.
_EXISTS_SQL = """
SELECT c_mktsegment, count(*) AS n
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_subquery_exists", oracle=_EXISTS_SQL)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


# Correlated NOT EXISTS -> anti join.
_NOT_EXISTS_SQL = """
SELECT n_name, count(*) AS n_idle_suppliers
FROM supplier s JOIN nation ON n_nationkey = s.s_nationkey
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
GROUP BY n_name
ORDER BY n_name
"""


@query("q_subquery_not_exists", oracle=_NOT_EXISTS_SQL)
def q_subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(_NOT_EXISTS_SQL)


# IN subquery over a derived aggregate (orders whose order key appears in
# the high-quantity lineitem set) — TPC-H Q18 flavor.
_IN_SQL = f"""
SELECT o_orderpriority, count(*) AS n_orders, {sql_dsum('o_totalprice')} AS total
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_subquery_in_agg", oracle=_IN_SQL)
def q_subquery_in_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(_IN_SQL)


# Correlated scalar aggregate: each part's max lineitem discount vs the
# part-type average retail price (TPC-H Q17 flavor, decorrelated by
# Catalyst into an aggregated join).
_CORR_AGG_SQL = """
SELECT p_brand, count(*) AS n_cheap
FROM part p
WHERE p_retailprice < (
  SELECT 0.9 * max(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
GROUP BY p_brand
ORDER BY p_brand
"""


@query("q_subquery_corr_agg", oracle=_CORR_AGG_SQL)
def q_subquery_corr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(_CORR_AGG_SQL)


# Correlated LATERAL subquery with LIMIT — "top-2 per outer row" written
# the way a SQL-first user writes it. Catalyst decorrelates the lateral
# into a ranked window join (no per-row re-execution), so the shape that
# reaches the executor is the same partitioned top-k as
# q_window_topk_per_group — usable at 100 TB, unlike a nested-loop
# interpretation.
_LATERAL_SQL = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) c
ORDER BY n_name, c_acctbal DESC, c_custkey
"""


@query("q_subquery_lateral_topk", oracle=_LATERAL_SQL)
def q_subquery_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# TPC-H Q22 shape: scalar subquery threshold + anti join + aggregate.
# "Well-funded customers with no recent order, by market segment."
# Catalyst plans this as: one broadcast scalar (the avg), one
# left-anti hash join against the date-filtered orders (never a
# per-row probe), one partial-agg'd groupBy — three operators that
# all scale linearly.
_Q22_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_dormant,
       {sql_dsum('c_acctbal')} AS dormant_balance
FROM customer c
WHERE c_acctbal > (
    SELECT {sql_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_subquery_dormant_customers", oracle=_Q22_SQL)
def q_subquery_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(_Q22_SQL)
