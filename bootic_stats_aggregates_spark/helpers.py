"""Shared column-expression helpers enforcing the oracle-determinism rules.

Money math uses EXACT FIXED-POINT arithmetic: 2-decimal money columns are
scaled to integer cents (and discount/tax factors to integer percents), so
sums are exact int64 math — order-independent at any shuffle parallelism
AND on the codegen fast path (decimal(>18) aggregation falls off Spark's
compact-long representation and costs ~4x; measured 864ms -> 244ms on the
sf0.1 q1 — see bench.py).

The final division back to currency units and round() are performed with
the identical expression shape on both engines, so the rounded doubles
match bit-for-bit.

Scale note: int64 accumulators hold ~9e18; at 100 TB-scale row counts the
micros-scaled products (1e11/row) would need the decimal path or a
two-level (partial cents -> decimal merge) cascade — the helpers keep that
switch in one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def money(col: str | Column) -> Column:
    """Cast a money-ish double column to an exact decimal (for the few
    places where decimal semantics are wanted explicitly)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def cents(col: str | Column) -> Column:
    """2-decimal double -> exact integer cents (int64).

    NaN/±Inf/overflow contract (r7): an unrepresentable amount becomes
    NULL cents — it contributes NOTHING to any sum, exactly like the
    established NULL policy ("an unknown amount increments nothing").
    Without the guard, a single NaN (or a finite value past ~9.2e16
    dollars) leaked into a 100 TB metrics column ABORTS every money
    aggregation fleet-wide under ANSI mode (CAST_OVERFLOW on the long
    cast) — measured, tests/test_properties.py pins the policy. ONE
    BETWEEN predicate covers all three cases (NaN compares false; ±Inf
    and long-overflow magnitudes fall outside), rides the existing
    codegen'd projection (A/B on the sf0.1 rollup: within noise, ≤4%),
    and the fixtures contain only in-range values so every oracle is
    unaffected. The bound is 1e15 dollars = 1e17 cents, comfortably
    inside int64 while far above any real ledger.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.between(-1e15, 1e15), F.round(c * 100).cast("long")
    )


def _cents_sql(expr: str) -> str:
    """DuckDB twin of :func:`cents` INCLUDING the non-finite/overflow
    guard: the Spark side maps NaN/±Inf/|x|>1e15 to NULL cents via the
    BETWEEN predicate, so the oracle must implement the identical
    contract or a hostile fixture with one NaN would fail every money
    oracle for the wrong reason (ADVICE r7 — both engines agree that an
    unrepresentable amount contributes nothing). DuckDB's BETWEEN on NaN
    is false and ±Inf falls outside the bound, exactly like Spark's."""
    return (
        f"CASE WHEN ({expr}) BETWEEN -1e15 AND 1e15 "
        f"THEN CAST(round(({expr}) * 100) AS BIGINT) END"
    )


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact money sum: int64 cents accumulate, divide+round at the end."""
    return F.round(F.sum(cents(col)).cast("double") / 100.0, scale).alias(alias)


def oracle_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum` (identical expression shape)."""
    return (
        f"round(CAST(sum({_cents_sql(expr)}) AS DOUBLE) / 100.0, {scale})"
        f" AS {alias}"
    )


def davg(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-stable average: exact cents sum / 100 / count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(cents(c)).cast("double") / 100.0 / F.count(c), scale
    ).alias(alias)


def oracle_avg(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"round(CAST(sum({_cents_sql(expr)}) AS DOUBLE) / 100.0"
        f" / count({expr}), {scale}) AS {alias}"
    )


def _pct(col: str, plus: bool) -> Column:
    """``100 -/+ round(col*100)`` as exact integer percent points."""
    p = F.round(F.col(col) * 100).cast("long")
    return (F.lit(100) + p) if plus else (F.lit(100) - p)


def rev_sum(alias: str, scale: int = 2) -> Column:
    """Exact ``sum(l_extendedprice * (1 - l_discount))``: price cents x
    (100 - discount%) accumulate as int64 'micro' units (1e-4 currency)."""
    micros = cents("l_extendedprice") * _pct("l_discount", plus=False)
    return F.round(F.sum(micros).cast("double") / 1e4, scale).alias(alias)


def oracle_rev_sum(alias: str, scale: int = 2) -> str:
    return (
        f"round(CAST(sum({_cents_sql('l_extendedprice')}"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)"
        f" / 1e4, {scale}) AS {alias}"
    )


def charge_sum(alias: str, scale: int = 2) -> Column:
    """Exact ``sum(l_extendedprice * (1-l_discount) * (1+l_tax))`` in 1e-6
    currency units (int64; ~1e11/row — fine to ~1e7 rows/group, switch to
    decimal merge beyond)."""
    micros = (
        cents("l_extendedprice")
        * _pct("l_discount", plus=False)
        * _pct("l_tax", plus=True)
    )
    return F.round(F.sum(micros).cast("double") / 1e6, scale).alias(alias)


def oracle_charge_sum(alias: str, scale: int = 2) -> str:
    return (
        f"round(CAST(sum({_cents_sql('l_extendedprice')}"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
        " * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE)"
        f" / 1e6, {scale}) AS {alias}"
    )


def lcount(alias: str = "n") -> Column:
    """count(*) as BIGINT (matches DuckDB count -> BIGINT)."""
    return F.count(F.lit(1)).cast("long").alias(alias)


def lsum(col: str | Column, alias: str) -> Column:
    """Exact integer sum as BIGINT (DuckDB sums BIGINT into HUGEINT — the
    oracle side must CAST back to BIGINT; this is the Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long").alias(alias)
