"""Exact decimal money math for oracle-stable aggregates.

Float sums are order-dependent, and Spark's partial/final aggregation
order differs from any single-threaded oracle. All fixture money/qty
columns carry <= 2 decimal places, so casting to DECIMAL before
aggregating makes every sum EXACT — bit-identical no matter the
partitioning — and therefore identical between a 1000-executor cluster
run and the DuckDB oracle. Final outputs are cast back to DOUBLE for a
stable cross-engine wire type.

Precisions are chosen so products stay within 38 digits:
  money(12,2) * frac(3,2) -> (16,4);  * frac(3,2) again -> (20,6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money(col: Column | str) -> Column:
    """A price/amount column as exact decimal."""
    return dec(col, 12, 2)


def frac(col: Column) -> Column:
    """A [0,1]-ish factor (discount, tax) as exact decimal."""
    return col.cast("decimal(3,2)")


def as_double(col: Column) -> Column:
    return col.cast("double")
