"""Analytic query catalog (SURVEY.md §2.2).

Numeric-determinism helpers
---------------------------
The driver hash-compares Spark output against DuckDB bit-for-bit, but raw
double SUM/AVG is summation-order-dependent and differs between engines.
Pattern used throughout (on BOTH sides):

  sum:  cast operands to DECIMAL (exact arithmetic, order-independent),
        sum in decimal, cast the final result to DOUBLE — the decimal->
        double rounding of an identical exact value is identical IEEE.
  avg:  CAST(decimal_sum AS DOUBLE) / count — one IEEE division of
        identical doubles.
  stddev/var: explicit sum-of-squares formula over decimal sums, with the
        final arithmetic in double; identical expression both sides.

min/max/count and decimal arithmetic are exact and safe as-is.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf0.1 and beyond (plain sums only).
DEC = "decimal(18,4)"
# Narrower operand types for products: (14,4)*(6,4)*(6,4) -> decimal(28,12),
# still inside the 38-digit cap, so multiplication stays EXACT in both
# engines (Spark truncates scale past 38 digits; DuckDB differs there).
DEC_MONEY = "decimal(14,4)"
DEC_RATE = "decimal(6,4)"


# Final cast always narrows to DECIMAL(18,4) first: the scaled integer then
# fits in 2^53, so decimal->double is exact-then-correctly-rounded in BOTH
# engines (DuckDB's wide-decimal->double cast is NOT correctly rounded: it
# divides int128 by 10^scale in floating point — observed 1-ulp drift at
# scale 12).
def to_dbl(c: Column) -> Column:
    return c.cast(DEC).cast("double")


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column via exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return to_dbl(F.sum(c.cast(DEC)))


def davg(col: Column | str) -> Column:
    """Deterministic average: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return to_dbl(F.sum(c.cast(DEC))) / F.count(c)


# DuckDB's decimal->decimal scale-reduction cast TRUNCATES, Spark's rounds
# HALF_UP — so round() explicitly first (half-away-from-zero, matching
# Spark) and only then narrow losslessly.
def sql_to_dbl(expr: str) -> str:
    return f"CAST(CAST(round({expr}, 4) AS DECIMAL(18,4)) AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return sql_to_dbl(f"sum(CAST({expr} AS DECIMAL(18,4)))")


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{sql_dsum(expr)} / count({expr})"


# Deterministic hash discipline: md5 of a salted key, first 48 bits,
# reduced mod ``mod`` — identical on both engines (md5 is
# engine-independent; conv/CAST of a 12-hex-digit slice fits a BIGINT
# exactly). THE one definition behind the CMS buckets
# (queries/aggregates.py), the Bloom bit positions (queries/joins.py)
# and the cms_sketch_maintainer (streaming/analytics.py), so a recipe
# change cannot diverge an operator from its oracle or a monitor from
# its batch twin.
def md5_mod(salt: str, key, mod: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def sql_md5_mod(salt: str, key: str, mod: int) -> str:
    """DuckDB-side twin of :func:`md5_mod`."""
    return (
        f"CAST('0x' || substring(md5('{salt}:' || CAST({key} AS VARCHAR)), "
        f"1, 12) AS BIGINT) % {mod}"
    )
