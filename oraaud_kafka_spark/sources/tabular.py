"""Tabular batch sources/sinks (SURVEY.md §2.2 scans/sources/sinks):
CSV, JSON-lines, Parquet — thin declarative wrappers so every scan gets
Catalyst's pushdown/pruning, plus scale-aware write helpers.

Scale notes baked in:
- Always pass an explicit schema in production: schema inference is a
  full extra pass over the data (fatal at 100 TB).
- Partitioned parquet writes give partition pruning on read; bucketed
  saveAsTable gives shuffle-free joins on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    *,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "error",
    compression: str = "zstd",
) -> None:
    """Partition by low-cardinality filter columns (date, region) so
    reads prune whole directories; never by a high-cardinality key
    (one directory per value kills the namenode/listing)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Bucketed managed table: joins/aggs on the bucket key skip the
    shuffle entirely — the co-located-join strategy for repeated
    fact-fact joins at scale."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table, format="parquet")
