"""Vector math over array<float/double> columns.

Three kernels, picked per call-site by measurement (sf0.1, local[32]):

- `dot`/`norm`/`cosine`: `zip_with`+`aggregate` higher-order folds.
  The lambda is interpreted per element (HOFs sit outside whole-stage
  codegen), but the fold is a single tight pass — measured FASTER than
  a 64-term unrolled `GetArrayItem` sum (which bloats the generated
  method past the 64 KB JIT limit and falls back to interpretation of
  a much bigger tree). Right default for per-row work and
  bounded-candidate joins.
- `cosine_pre`: dot fold with both norms precomputed per SIDE of a
  join instead of per PAIR — removes 2/3 of the per-pair float work in
  candidate-verify joins at zero semantic cost (a vector's norm is the
  same double wherever it is evaluated, so oracle parity is exact).
- `cosine_pandas`: Arrow-batched numpy for joins with millions of
  candidate pairs, where any per-row JVM expression is the bottleneck.
  numpy's pairwise summation differs from the sequential fold in the
  last ulp, so use it ONLY in rows-only/recall-tested queries, never
  under an exact-value oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with the per-side norms already materialized as columns —
    compute `norm(...)` once per join side, not once per candidate
    pair. Bit-identical to `cosine` (same doubles, same fold order)."""
    return dot(a, b) / (norm_a * norm_b)


# DataType instance, not DDL string: string return types are parsed via
# the active SparkContext, which doesn't exist yet at import time.
@pandas_udf(DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine over two array columns: one numpy matrix
    per batch, ~100x the throughput of per-row JVM expression trees on
    million-pair verify joins. Not bit-identical to the sequential fold
    (numpy sums pairwise) — rows-only / recall-tested call sites only."""
    import numpy as np

    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb)
    na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
    nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
    return pd.Series(dots / (na * nb))
