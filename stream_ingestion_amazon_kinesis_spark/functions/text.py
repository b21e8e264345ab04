"""Tokenization and text-metric column expressions (all JVM-side)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — the MinHash input unit.

    Built from transform over a token index range, so it stays inside
    whole-stage codegen (no Python).
    """
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
