"""Vector math over array<float/double> columns, JVM-side.

`F.zip_with` + `F.aggregate` keep the dot product inside whole-stage
codegen — no Python round-trip — which is the right default for
embedding columns at 100 TB. (A Pandas-UDF/numpy batch variant only
wins when vectors are wide enough that JVM boxing dominates; at 64-dim
the built-ins are fine and shuffle-free.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
