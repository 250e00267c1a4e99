"""Segmented running max: an associative prefix scan decomposed so no
unpartitioned (or tiny-domain-partitioned) ordered window ever owns
row-cardinality data — the round-10 scale re-shape pattern shared by
q_time_late_data (two bucket levels over event_id ranges) and
q_window_max_drawdown (one month-bucket level per priority), and the
same decomposition q_events_concurrency proved for running SUMS.

Shape, and why each piece looks the way it does:

- bucket-LOCAL running max: a window partitioned by (partition...,
  bucket) ordered by the caller's total order — fine-grained,
  data-proportional parallelism.
- per-bucket maxima come from a SECOND map-side-combined pass over the
  input, deliberately NOT derived from the window output: consuming
  the window column would share its shuffle via ReusedExchange but
  re-SORT the full table to recompute the window in that branch,
  while a fresh narrow scan + partial_max ships only bucket rows
  through its exchange. Two cheap scans beat one scan + one extra
  full-table sort at 100 TB.
- bucket maxima prefix-merge through one (optionally two) bounded
  offset windows; the final running max is greatest(offset, local).
  greatest() skips NULLs, reproducing the plain window's NULL-value
  semantics (max ignores NULLs; an all-NULL prefix stays NULL).
- join keys are NULL-SAFE (<=>): a NULL bucket/partition key is its
  own group in the plain window form on both engines, and a plain
  equi-join would drop it — plus equi-keys make Catalyst infer
  isnotnull filters on one branch only, desynchronizing the branches.

Every caller keeps its DuckDB oracle stated as the PLAIN global/
tiny-domain window; the driver's hash match proves this decomposition
exact per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def segmented_running_max(
    df: DataFrame,
    *,
    value: str,
    order_cols: tuple[str, ...],
    bucket: str,
    partition: tuple[str, ...] = (),
    superbucket: str | None = None,
    broadcast_offsets: bool = False,
    out: str = "run_max",
) -> DataFrame:
    """``df`` + column ``out`` = running max of ``value`` over
    ``order_cols`` within each ``partition`` group, where ``bucket``
    (and optionally ``superbucket``) are order-consistent segment keys:
    every row of bucket b sorts before every row of bucket b+1 within
    its partition group. Set ``broadcast_offsets`` only when the bucket
    domain is bounded by construction (e.g. calendar months), never
    when it grows with the data (see tests/test_broadcast_hints.py)."""
    keys = [*partition]
    lvl1 = [*keys, *( [superbucket] if superbucket else [] )]
    wl = (
        Window.partitionBy(*lvl1, bucket)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = df.select("*", F.max(value).over(wl).alias("__local_max"))

    bmax = df.groupBy(*lvl1, bucket).agg(F.max(value).alias("__bmax"))
    if superbucket is None:
        wb = (
            Window.partitionBy(*keys)
            .orderBy(bucket)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = bmax.select(
            *keys, bucket, F.max("__bmax").over(wb).alias("__offset")
        )
    else:
        wb = (
            Window.partitionBy(*keys, superbucket)
            .orderBy(bucket)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        bmax = bmax.withColumn("__b_prefix", F.max("__bmax").over(wb))
        smax = bmax.groupBy(*keys, superbucket).agg(
            F.max("__bmax").alias("__smax")
        )
        ws = (
            Window.partitionBy(*keys)
            .orderBy(superbucket)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # rename EVERY join key on the soff side (not just superbucket):
        # soff shares bmax's lineage, so bmax[k]/soff[k] column refs are
        # the classic Spark self-join ambiguity — unique names make the
        # condition resolve by name alone, same discipline as the outer
        # join below
        soff = smax.select(
            *[F.col(k).alias(f"__s_{k}") for k in keys],
            F.col(superbucket).alias("__s_sb"),
            F.max("__smax").over(ws).alias("__s_prefix"),
        )
        cond = F.col(superbucket).eqNullSafe(F.col("__s_sb"))
        for k in keys:
            cond = cond & F.col(k).eqNullSafe(F.col(f"__s_{k}"))
        offsets = bmax.join(soff, cond).select(
            *keys,
            bucket,
            # everything strictly before this bucket: prior
            # superbuckets' max, then prior buckets within this one
            F.greatest("__s_prefix", "__b_prefix").alias("__offset"),
        )

    renames = {k: f"__r_{k}" for k in (*keys, bucket)}
    offsets = offsets.select(
        *[F.col(k).alias(v) for k, v in renames.items()], "__offset"
    )
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    cond = F.col(bucket).eqNullSafe(F.col(renames[bucket]))
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(renames[k]))
    return (
        local.join(offsets, cond)
        .select(
            *df.columns,
            F.greatest("__offset", "__local_max").alias(out),
        )
    )
