"""Deterministic floating-point aggregation.

Summing doubles is order-dependent (FP addition is not associative), so a
distributed sum is not bit-reproducible across engines or even across runs
with different partitioning. Every aggregate the engine exposes therefore
routes through exact decimal arithmetic: cast each addend to a fixed-scale
decimal, sum exactly, cast the final value back to double. The result is
bit-identical regardless of partitioning, shuffle order, or engine — which
is what makes a value-hash correctness gate against DuckDB possible.

At scale this costs one extra JVM-side cast per row inside the partial
aggregate — negligible next to the shuffle it feeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column via exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def dmean(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def sql_dmean(expr: str, scale: int = 6) -> str:
    """DuckDB-side mirror of :func:`dmean`."""
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
