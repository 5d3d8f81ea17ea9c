"""Shared column-expression helpers enforcing the oracle-determinism rules.

Money math goes through DECIMAL(18,2): decimal sums are exact and
order-independent, so the Spark result and the DuckDB oracle agree bit-for-bit
after ``round`` + cast back to DOUBLE — regardless of shuffle/merge order.
(Summing raw doubles is order-dependent; at 100 TB with thousands of partial
aggregates that nondeterminism is guaranteed to surface.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def money(col: str | Column) -> Column:
    """Cast a money-ish double column to an exact decimal for aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum, rounded, surfaced as DOUBLE (oracle-stable)."""
    return F.round(F.sum(money(col)), scale).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-stable average: exact decimal sum / count, in double, rounded.

    Both engines compute the identical double division (exact decimal
    numerator, exact bigint denominator), so the rounded result matches.
    Oracle twin: ``round(CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    / count(x), 4)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(money(c)).cast("double") / F.count(c), scale
    ).alias(alias)


def dec4(expr: Column) -> Column:
    """Cast a small factor (e.g. ``1 - l_discount``) to exact DECIMAL(8,4).

    Discount/tax columns carry <=2 decimal digits, so 4 digits of headroom
    makes the double->decimal conversion unambiguous in both engines; the
    subsequent DECIMAL(18,2) * DECIMAL(8,4) product is then exact — no
    double round-trip mid-expression (casting the raw double *product* to
    decimal is engine-dependent at midpoints; this form is not).
    """
    return expr.cast("decimal(8,4)")


def revenue_dec() -> Column:
    """Exact-decimal ``l_extendedprice * (1 - l_discount)``."""
    return money("l_extendedprice") * dec4(F.lit(1.0) - F.col("l_discount"))


def charge_dec() -> Column:
    """Exact-decimal ``l_extendedprice * (1 - l_discount) * (1 + l_tax)``."""
    return revenue_dec() * dec4(F.lit(1.0) + F.col("l_tax"))


#: DuckDB twins of revenue_dec()/charge_dec() for oracle SQL strings.
REV_DEC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(8,4))"
)
CHARGE_DEC_SQL = f"({REV_DEC_SQL}) * CAST(1.0 + l_tax AS DECIMAL(8,4))"


def dsum_raw(expr: Column, alias: str, scale: int = 2) -> Column:
    """Sum an already-exact decimal expression, round, surface as DOUBLE."""
    return F.round(F.sum(expr), scale).cast("double").alias(alias)


def oracle_dsum_raw(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum_raw` (``expr`` must already be DECIMAL)."""
    return f"CAST(round(sum({expr}), {scale}) AS DOUBLE) AS {alias}"


def lcount(alias: str = "n") -> Column:
    """count(*) as BIGINT (matches DuckDB count -> BIGINT)."""
    return F.count(F.lit(1)).cast("long").alias(alias)


def lsum(col: str | Column, alias: str) -> Column:
    """Exact integer sum as BIGINT (DuckDB sums BIGINT into HUGEINT — the
    oracle side must CAST back to BIGINT; this is the Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long").alias(alias)


def oracle_avg(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`davg` for embedding in oracle SQL strings."""
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"
        f" / count({expr}), {scale}) AS {alias}"
    )


def oracle_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    return (
        f"CAST(round(sum(CAST({expr} AS DECIMAL(18,2))), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )
