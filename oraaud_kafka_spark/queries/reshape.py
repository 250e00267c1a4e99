"""Reshape & profiling surface: unpivot/melt (wide->long) and one-pass
table profiling — the utility ops every dataset onboarding flow runs
before anything else touches the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_UNPIVOT_ORACLE = """
WITH u AS (
  UNPIVOT (
    SELECT p_partkey, p_retailprice, CAST(p_size AS DOUBLE) AS p_size_d
    FROM part WHERE p_partkey < 50
  )
  ON p_retailprice, p_size_d INTO NAME metric VALUE val
)
SELECT p_partkey, metric, val
FROM u
ORDER BY p_partkey, metric
"""


@query("q_unpivot", oracle=_UNPIVOT_ORACLE)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt via the native unpivot operator (Expand node in
    the plan: one pass, rows x n_value_cols output, no shuffle)."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 50)
        .select(
            "p_partkey",
            "p_retailprice",
            F.col("p_size").cast("double").alias("p_size_d"),
        )
    )
    return (
        p.unpivot(
            ids=["p_partkey"],
            values=["p_retailprice", "p_size_d"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("p_partkey", "metric")
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_PROFILE_ORACLE = (
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       count({c}) AS n_nonnull,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_val,
       CAST(max({c}) AS DOUBLE) AS max_val
FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name"
)


@query("q_profile_table", oracle=_PROFILE_ORACLE)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (non-null / distinct / min / max) for several
    columns in ONE scan: all aggregates compute in a single pass (the
    oracle unions per-column scans — DuckDB at sf0.01 doesn't care, but
    at 100 TB the single-scan shape is the difference between one pass
    and n_cols passes), then the 1-row result explodes into a row per
    column. min/max/count are exact, no float summation anywhere."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__d"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n").alias("n_nonnull"),
                F.col(f"{c}__d").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode_outer(per_col).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


# Contingency table with margins: lang x source counts pivoted wide,
# plus a row total — the crosstab every corpus-composition review
# starts from. One partial-agg'd groupBy + a width-5 conditional-count
# pivot; margins are plain sums over the pivoted columns (no second
# scan, no rollup pass).
_SOURCES = tuple(f"src{i}" for i in range(5))
_XTAB_COLS = ", ".join(
    f"count(*) FILTER (WHERE source = '{s}') AS n_{s}" for s in _SOURCES
)

_CROSSTAB_ORACLE = f"""
SELECT lang, {_XTAB_COLS}, count(*) FILTER (WHERE source IN ({", ".join(f"'{s}'" for s in _SOURCES)})) AS n_total
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query("q_crosstab_margins", oracle=_CROSSTAB_ORACLE)
def q_crosstab_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    counts = [
        F.count(F.when(F.col("source") == s, 1)).alias(f"n_{s}") for s in _SOURCES
    ]
    total = F.count(F.when(F.col("source").isin(*_SOURCES), 1)).alias("n_total")
    return d.groupBy("lang").agg(*counts, total).orderBy("lang")
