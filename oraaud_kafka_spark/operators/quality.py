"""Data-quality constraint checking (the Deequ/Great-Expectations shape
on native Spark aggregates): declare constraints, get back ONE report
DataFrame of (constraint, n_violations, passed).

Three evaluation shapes, each chosen for 100 TB behavior:
- column predicates (not-null, range, set membership) compile into ONE
  conditional-sum aggregate — a single scan regardless of how many
  predicates are declared, partial-agg'd map-side;
- uniqueness is one groupBy(key) counting groups with multiplicity > 1
  — the shuffle carries the key + a count, nothing else;
- referential integrity (every FK has a parent) is a LEFT ANTI join
  counting orphans — broadcast when the parent side is a dimension.

The three shapes union into the report; each row is (constraint_name,
n_violations, passed). All counts are exact integers so the report is
engine-portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def predicate_violations(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """``checks`` maps constraint name -> BOOLEAN Column that is True
    when the row SATISFIES the constraint. Returns (constraint,
    n_violations) — one scan for all checks; a NULL predicate result
    counts as a violation (unknown is not satisfied)."""
    aggs = [
        F.sum(
            F.when(cond.isNull() | ~cond, 1).otherwise(0)
        ).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{n}', `{n}`" for n in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_expr}) AS (constraint_name, n_violations)"
    )


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows participating in a duplicated key, as (constraint,
    n_violations)."""
    name = "unique(" + ",".join(key_cols) + ")"
    dup_rows = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_violations"))
    )
    return dup_rows.select(F.lit(name).alias("constraint_name"), "n_violations")


def referential_violations(
    child: DataFrame, parent: DataFrame, on: tuple[str, str]
) -> DataFrame:
    """Child rows whose FK has no parent row (LEFT ANTI), as
    (constraint, n_violations)."""
    ck, pk = on
    name = f"ref({ck}->{pk})"
    # NULL FKs are the not_null constraint's business, not referential
    # integrity's (and SQL's NOT IN would nuke the whole check on one
    # NULL parent key) — both engines use NOT-EXISTS semantics over
    # non-null children
    orphans = (
        child.filter(F.col(ck).isNotNull())
        .join(parent.select(F.col(pk).alias(ck)).distinct(), ck, "left_anti")
        .agg(F.count("*").cast("long").alias("n_violations"))
    )
    return orphans.select(F.lit(name).alias("constraint_name"), "n_violations")


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union the constraint result frames into the final report with the
    passed flag, ordered by constraint name."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "constraint_name",
        "n_violations",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).alias("passed"),
    ).orderBy("constraint_name")
