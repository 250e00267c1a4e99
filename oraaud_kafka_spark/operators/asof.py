"""Generic as-of join operator (SURVEY.md §2.2 / §7 "hard parts").

Spark has no native ASOF JOIN. The scalable formulation: tag and union
both sides, then one window pass per key carries the build side's latest
value forward onto each probe row —

    ONE shuffle (on the key), ZERO joins, state O(1) per row.

A per-row range probe (join on key + ts <= probe_ts + top-1) is
quadratic in the worst case and needs a range-join; this shape survives
arbitrarily skewed key/time distributions, so it is the 100-TB path.

Direction 'backward' (classic as-of): probe row gets the most recent
build value at-or-before its timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    value_cols: list[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """For each probe row, attach the build row values with the greatest
    ``build_ts`` <= ``probe_ts`` for the same ``on`` keys.

    Ties among build rows at the same (key, ts) are resolved by keeping
    the LAST in ``build``'s sort by value_cols (deterministic); callers
    wanting a specific winner should pre-aggregate build to one row per
    (key, ts). ``tolerance`` (e.g. ``F.expr("INTERVAL 1 HOUR")``)
    nulls out matches older than ``probe_ts - tolerance``.
    """
    ts = "__asof_ts"
    side = "__asof_side"
    probe_cols = [c for c in probe.columns if c not in on and c != probe_ts]
    b = build.select(
        *on,
        F.col(build_ts).alias(ts),
        F.lit(0).alias(side),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
        *value_cols,
    )
    p = probe.select(
        *on,
        F.col(probe_ts).alias(ts),
        F.lit(1).alias(side),
        *probe_cols,
        *[F.lit(None).cast(build.schema[c].dataType).alias(c) for c in value_cols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts, side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = b.unionByName(p).select(
        *on,
        ts,
        side,
        *probe_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.when(F.col(side) == 1, F.max(F.when(F.col(side) == 0, F.col(ts))).over(w))
        .alias("__asof_matched_ts"),
    )
    out = carried.filter(F.col(side) == 1)
    if tolerance is not None:
        within = F.col("__asof_matched_ts") >= F.col(ts) - tolerance
        out = out.select(
            *on,
            ts,
            *probe_cols,
            *[F.when(within, F.col(c)).alias(c) for c in value_cols],
        )
    else:
        out = out.select(*on, ts, *probe_cols, *value_cols)
    return out.withColumnRenamed(ts, probe_ts)
