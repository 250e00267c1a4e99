"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; explicit salting is the deterministic fallback when one
key dominates so heavily that even split partitions overwhelm a task —
the classic "null key / celebrity key" problem at 100 TB.

Shape: the skewed (large) side gets a random salt in [0, n); the small
side is replicated n times with every salt value; the join key becomes
(key, salt). Each hot key's rows spread over n tasks; row multiplicity
is unchanged, so any downstream aggregate is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    *,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large`` with ``small`` on ``on``, salting the large
    side's key across ``n_salts`` sub-keys. ``small`` is replicated
    n_salts times (keep it the dimension side)."""
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")
