"""Triangle-decomposed blocked self-join — bounded task width for
pairwise (all-pairs-within-block) operators.

Blocked pairwise ops (n-gram Jaccard, embedding near-dup) compare every
row pair sharing a blocking key. The block is the unit of work for a
plain self-join: one pathological block of width w lands w^2/2 pair
comparisons on a SINGLE task. AQE's skew splitting can't help — it
splits by shuffle-partition bytes, but the blow-up happens inside the
join, after partitioning.

Decomposition: give each row a sub-bucket s = hash(id) mod n. The
unordered pair-space {(sa, sb)} splits into the n(n+1)/2 grid cells
{(i, j) : i <= j}; each row replicates to the n cells it can meet a
partner in, the join key becomes (block, cell), and a post-join filter
keeps each pair exactly where cell == (min(sa,sb), max(sa,sb)) — every
pair compared exactly once, per-task pair count bounded by (w/n)^2
instead of w^2. Cost: n-fold row replication through the shuffle,
bought back n-fold in the quadratic term; for w in the millions and
n ~ hundreds this is the difference between a task that finishes and
one that runs for days.

Same trick Vernica/Carey/Li use for parallel set-similarity joins
(SIGMOD'10) and the classic MapReduce theta-join partitioning
(Okcan/Riedewald, SIGMOD'11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def triangle_self_join(
    df: DataFrame,
    *,
    block_cols: list[str],
    id_col: str,
    n_sub: int = 4,
    pair_filter: Column | None = None,
) -> DataFrame:
    """All ordered pairs (a, b) with a.id < b.id sharing ``block_cols``,
    with per-task width bounded via ``n_sub``-way triangle decomposition.

    Returns the join of two copies of ``df`` whose non-block columns are
    suffixed ``_a`` / ``_b``; ``pair_filter`` (over those suffixed
    columns) is applied after the pair is formed.
    """
    sub = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_sub)).cast("int")
    # every (i, j) grid cell with i <= j, as one literal array to explode
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("ci"), F.lit(j).alias("cj"))
            for i in range(n_sub)
            for j in range(i, n_sub)
        ]
    )
    tagged = df.withColumn("__sub", sub)
    # a row with sub-bucket s participates in every cell containing s
    replicated = tagged.withColumn(
        "__cell",
        F.explode(
            F.filter(
                cells,
                lambda c: (c.ci == F.col("__sub")) | (c.cj == F.col("__sub")),
            )
        ),
    )

    others = [c for c in df.columns if c not in block_cols]
    a = replicated.select(
        *block_cols,
        "__cell",
        F.col("__sub").alias("__sub_a"),
        *[F.col(c).alias(f"{c}_a") for c in others],
    )
    b = replicated.select(
        *block_cols,
        "__cell",
        F.col("__sub").alias("__sub_b"),
        *[F.col(c).alias(f"{c}_b") for c in others],
    )
    pairs = (
        a.join(b, [*block_cols, "__cell"])
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        # keep each pair only in its canonical cell (dedupes the multi-
        # cell meetings of same-sub-bucket pairs)
        .filter(
            (F.col("__cell.ci") == F.least("__sub_a", "__sub_b"))
            & (F.col("__cell.cj") == F.greatest("__sub_a", "__sub_b"))
        )
        .drop("__cell", "__sub_a", "__sub_b")
    )
    if pair_filter is not None:
        pairs = pairs.filter(pair_filter)
    return pairs
