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


def mulmod32_sql(col: str, mult, idiv: str) -> str:
    """`(col * mult) mod 2^32` as engine-portable SQL that never
    overflows int64 for ANY non-negative BIGINT col (the naive product
    wraps silently in non-ANSI Spark but RAISES in DuckDB once
    col >= ~3.5e9, so the engines would diverge at extreme scale).
    16-bit split: with d = col mod 2^32, d_hi = d div 2^16,
    d_lo = d mod 2^16, (d*m) mod 2^32 =
    ((d_hi*m mod 2^32) * 2^16 + d_lo*m) mod 2^32; every intermediate is
    < 2^49. Identical values to the naive product wherever that product
    fits. `mult` may be an int or a SQL expression (< 2^32); `idiv` is
    the engine's integer-division operator ("div" Spark, "//" DuckDB).
    Used by the arithmetic-hash family (shard assignment, epoch
    shuffle, MinHash permutations) whose oracles must compute the exact
    same hash in DuckDB."""
    d_hi = f"(({col} % 4294967296) {idiv} 65536)"
    hi = f"(({d_hi} * ({mult})) % 4294967296)"
    lo = f"(({col} % 65536) * ({mult}))"
    return f"(({hi} * 65536 + {lo}) % 4294967296)"
