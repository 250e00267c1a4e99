"""Top-k operators.

- Global top-k: orderBy().limit(k) — Catalyst plans TakeOrderedAndProject
  (per-partition bounded heap + driver merge of k·partitions rows), never
  a full sort. Verified in tests/test_plans.py.
- Per-group top-k: row_number window + filter. The window shuffles once
  on the group key; rank state is O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_global(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .drop("__rnk")
    )
