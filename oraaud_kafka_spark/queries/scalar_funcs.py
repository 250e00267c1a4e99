"""Scalar function families (SURVEY.md §2.2): string, date/time, math,
conditional, hash. All JVM-side built-ins inside whole-stage codegen —
no Python UDFs anywhere on these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_STRING_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS uname,
       substring(c_name, 10, 9) AS id_part,
       length(c_name) AS name_len,
       concat(c_mktsegment, ':', c_name) AS tagged,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       replace(c_name, 'Customer', 'Cust') AS shortname,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS devoweled,
       instr(c_name, '#') AS hash_pos,
       trim(concat('  ', c_name, '  ')) AS trimmed,
       reverse(c_mktsegment) AS rev_seg,
       levenshtein(c_mktsegment, 'MACHINERY') AS lev_dist
FROM customer
WHERE c_custkey < 100
ORDER BY c_custkey
"""


@query("q_string_funcs", oracle=_STRING_ORACLE)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 10, 9).alias("id_part"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("shortname"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("devoweled"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.reverse(F.col("c_mktsegment")).alias("rev_seg"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("lev_dist"),
    ).orderBy("c_custkey")


_SPLIT_ORACLE = """
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS adjective,
       string_split(p_name, ' ')[2] AS noun,
       len(string_split(p_name, ' ')) AS n_words
FROM part
WHERE p_partkey < 100
ORDER BY p_partkey
"""


@query("q_string_split", oracle=_SPLIT_ORACLE)
def q_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        words.getItem(0).alias("adjective"),
        words.getItem(1).alias("noun"),
        F.size(words).alias("n_words"),
    ).orderBy("p_partkey")


# Date/time family. Chosen functions have identical cross-engine
# semantics (month-clamped add_months, boundary-counting datediff in whole
# days on date-typed inputs, epoch seconds on UTC session tz).
_DATE_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3mo,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       quarter(o_orderdate) AS qtr
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@query("q_date_funcs", oracle=_DATE_ORACLE)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_format(F.add_months(d.cast("date"), 3), "yyyy-MM-dd").alias("plus3mo"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("qtr"),
    ).orderBy("o_orderkey")


# Math family: abs/floor/ceil/round are exact; sqrt is IEEE
# correctly-rounded on both engines; integer pow is exact; ln/exp are
# libm-dependent so they are NOT in any oracle-checked output.
_MATH_ORACLE = """
SELECT p_partkey,
       abs(p_size - 25) AS dist_from_25,
       CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
       CAST(ceil(p_retailprice / 100) AS BIGINT) AS price_bucket_hi,
       round(p_retailprice, 1) AS price_r1,
       sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
       CAST(pow(p_size, 2) AS DOUBLE) AS size_sq,
       p_partkey % 7 AS key_mod,
       ((p_partkey - 100) % 7 + 7) % 7 AS key_pmod,
       greatest(p_size, 10) AS size_floor10,
       least(p_size, 40) AS size_cap40
FROM part
WHERE p_partkey < 150
ORDER BY p_partkey
"""


@query("q_math_funcs", oracle=_MATH_ORACLE)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("dist_from_25"),
        F.floor(F.col("p_retailprice") / 100).alias("price_bucket"),
        F.ceil(F.col("p_retailprice") / 100).alias("price_bucket_hi"),
        F.round(F.col("p_retailprice"), 1).alias("price_r1"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.pow(F.col("p_size"), 2).alias("size_sq"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        # pmod = always-non-negative modulus; DuckDB spells it ((x%n)+n)%n
        F.pmod(F.col("p_partkey") - 100, F.lit(7)).alias("key_pmod"),
        F.greatest(F.col("p_size"), F.lit(10)).alias("size_floor10"),
        F.least(F.col("p_size"), F.lit(40)).alias("size_cap40"),
    ).orderBy("p_partkey")


_HASH_ORACLE = """
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_mktsegment) AS seg_sha256
FROM customer
WHERE c_custkey < 50
ORDER BY c_custkey
"""


@query("q_hash_funcs", oracle=_HASH_ORACLE)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(F.col("c_mktsegment"), 256).alias("seg_sha256"),
    ).orderBy("c_custkey")


_COND_ORACLE = """
SELECT s_suppkey,
       coalesce(nullif(s_acctbal, 0.0), -9999.0) AS bal_or_sentinel,
       CASE WHEN s_acctbal > 5000 THEN 'high'
            WHEN s_acctbal > 0 THEN 'mid'
            ELSE 'low' END AS bal_band,
       greatest(s_acctbal, 0.0) AS bal_pos,
       least(s_acctbal, 1000.0) AS bal_capped,
       if(s_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
FROM supplier
ORDER BY s_suppkey
"""


@query("q_conditional_funcs", oracle=_COND_ORACLE)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-9999.0)).alias("bal_or_sentinel"),
        F.when(bal > 5000, "high").when(bal > 0, "mid").otherwise("low").alias("bal_band"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(1000.0)).alias("bal_capped"),
        F.when(F.col("s_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "nation_parity"
        ),
    ).orderBy("s_suppkey")
