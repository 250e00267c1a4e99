"""UDF/UDAF/UDTF surface (SURVEY.md §2.2): the four Python extension
points, each used the way it should be at scale — Arrow-batched
(pandas_udf / applyInPandas / UDTF), never row-at-a-time Python in a hot
path. Arithmetic inside the UDFs is chosen to be bit-deterministic
against the DuckDB oracle (integer ops, or single IEEE double ops on
identical operands) so even the Python-side results hash-match.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..tables import load

# ---------------------------------------------------------------------------
# Scalar pandas UDF: vectorized per-batch string transform.
# ---------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT n_name, reverse(lower(n_name)) AS rev
FROM nation ORDER BY n_name
"""


@query("q_udf_pandas_scalar", oracle=_SCALAR_ORACLE)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # defined here, not at module scope: pandas_udf parses its DDL type
    # against the active session
    @pandas_udf("string")
    def _rev_lower(s: pd.Series) -> pd.Series:
        return s.str.lower().map(lambda x: x[::-1])

    n = load(spark, sf_dir, "nation")
    return n.select("n_name", _rev_lower("n_name").alias("rev")).orderBy("n_name")


# ---------------------------------------------------------------------------
# Grouped-agg pandas UDF: exact integer-cents sum (floor(x*100+0.5) is
# the same IEEE sequence in numpy and DuckDB, so no float drift).
# ---------------------------------------------------------------------------

_GAGG_ORACLE = """
SELECT o_orderpriority,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_udf_pandas_grouped_agg", oracle=_GAGG_ORACLE)
def q_udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def _sum_cents(v: pd.Series) -> int:
        import numpy as np

        return int(np.floor(v.to_numpy() * 100 + 0.5).astype("int64").sum())

    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(_sum_cents("o_totalprice").alias("total_cents"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# applyInPandas (grouped map): per-group exact median. Sorting + middle
# picks are exact; the even-count case is one IEEE add + halve on
# identical doubles — identical to DuckDB's interpolating median.
# ---------------------------------------------------------------------------

_GMAP_ORACLE = """
SELECT c_mktsegment, count(*) AS n, median(c_acctbal) AS med
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def _median_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["c_acctbal"].sort_values().to_numpy()
    n = len(v)
    med = v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2
    return pd.DataFrame(
        {"c_mktsegment": [pdf["c_mktsegment"].iloc[0]], "n": [n], "med": [med]}
    )


@query("q_udf_apply_in_pandas", oracle=_GMAP_ORACLE)
def q_udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.select("c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(_median_group, "c_mktsegment string, n long, med double")
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 3.5+): one input row -> many output rows. Splits a
# part name into (pos, token) rows — semantics of posexplode(split) so
# the oracle is plain SQL.
# ---------------------------------------------------------------------------

_UDTF_ORACLE = """
SELECT p_partkey, CAST(pos - 1 AS INT) AS pos, tok
FROM (
  SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok,
         generate_subscripts(string_split(p_name, ' '), 1) AS pos
  FROM part WHERE p_partkey < 50
)
ORDER BY p_partkey, pos
"""


@query("q_udf_python_udtf", oracle=_UDTF_ORACLE)
def q_udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split(" ")):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    load(spark, sf_dir, "part").filter(F.col("p_partkey") < 50).createOrReplaceTempView(
        "_part_udtf"
    )
    return spark.sql(
        """
        SELECT p.p_partkey, t.pos, t.tok
        FROM _part_udtf p, LATERAL tokenize_udtf(p.p_name) t
        ORDER BY p.p_partkey, t.pos
        """
    )


# ---------------------------------------------------------------------------
# Row-at-a-time udf(), Arrow-optimized (useArrow=True): the modern form
# of the classic scalar UDF — per-row Python semantics, Arrow transport.
# Registered to complete the UDF surface; engine operators still prefer
# pandas_udf (whole-batch vectorization beats per-row calls even over
# Arrow). Integer arithmetic only, so the oracle hash-matches.
# ---------------------------------------------------------------------------

_ARROW_UDF_ORACLE = """
SELECT s_suppkey,
       (s_suppkey * 37 + length(s_name)) % 1000 AS bucket37
FROM supplier ORDER BY s_suppkey
"""


@query("q_udf_arrow_scalar", oracle=_ARROW_UDF_ORACLE)
def q_udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("long", useArrow=True)
    def _bucket37(k: int, name: str) -> int:
        return (k * 37 + len(name)) % 1000

    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey", _bucket37("s_suppkey", "s_name").alias("bucket37")
    ).orderBy("s_suppkey")
