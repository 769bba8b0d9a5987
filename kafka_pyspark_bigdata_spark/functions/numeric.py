"""Deterministic (engine-portable) numeric aggregation.

Floating-point sums depend on accumulation order, which differs between
engines and between runs at different parallelism (partial aggregation sums
per-partition, then merges). For oracle-exact results we accumulate in
DECIMAL — exact, associative, order-independent — and cast the final value
back to DOUBLE. Both Spark and DuckDB then produce bit-identical doubles.

This costs little: decimal sum is still a single-pass partial aggregation
(map-side combine + one shuffle of 16-byte accumulators), so the plan shape
at 100 TB is identical to a double sum.

Input-side cast double→decimal is itself deterministic across engines as
long as the value is not exactly on a rounding boundary — impossible for a
binary double vs a decimal half-ulp except for short binary fractions, which
the fixture generators don't produce.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default precision/scale: fits TPC-H-ish money (< 10^10) with 2 decimals.
PREC, SCALE = 18, 2


def dsum(col: Column | str, scale: int = SCALE, prec: int = PREC) -> Column:
    """Order-independent SUM: decimal accumulate, double result."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def davg(col: Column | str, scale: int = SCALE, prec: int = PREC) -> Column:
    """Order-independent AVG = exact decimal SUM / COUNT, divided in double.

    (Native AVG over decimal has engine-specific result-scale rules; an
    explicit double division sidesteps them.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double") / F.count(c)


def dsum_expr(expr: Column) -> Column:
    """Order-independent SUM of a pre-built decimal expression."""
    return F.sum(expr).cast("double")


# --- ANSI-SQL mirrors for the DuckDB oracle -------------------------------

def dsum_sql(col: str, scale: int = SCALE, prec: int = PREC) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def davg_sql(col: str, scale: int = SCALE, prec: int = PREC) -> str:
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT({col})"
    )
