"""Skew-mitigation helpers (SURVEY §4: salting for hot keys).

AQE's skew-join splitting (enabled in session.py) is the first line of
defense; these helpers are the explicit fallback when key skew is known
up front (a handful of users own half the events, one document source
dominates). Salts are derived deterministically from row content, not
rand(), so plans stay reproducible and retries are safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from the full row content."""
    return F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed grouping keys.

    Stage 1 groups on (keys + salt) so a hot key's rows spread over
    `n_salts` reducers; stage 2 combines the partials per key. `aggs`
    maps output column -> (partial_fn, combine_fn, input_col), e.g.
    {"n": (F.count, F.sum, "*"), "total": (F.sum, F.sum, "value")}.

    (For plain sums/counts Catalyst's map-side partial aggregation often
    suffices; salting matters when one reducer key still dominates after
    partials — e.g. high-cardinality payloads per key or collect_list.)
    """
    salted = df.withColumn("_salt", content_salt(df, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[pf(c).alias(f"_p_{out}") for out, (pf, _, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[cf(f"_p_{out}").alias(out) for out, (_, cf, _c) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    join_hint: str | None = None,
) -> DataFrame:
    """Equi-join where `skewed` has hot values of `key`: the skewed side
    gets a content salt, the small side is replicated to every salt, and
    the join key becomes (key, salt) — a hot key now lands on n_salts
    reducers instead of one. Replication multiplies the small side by
    n_salts, so this is for dimension-sized right sides.

    `join_hint` (e.g. "shuffle_hash" / "merge") pins the physical join
    on the replicated side. Salting only helps when the join actually
    SHUFFLES on the salted key — AQE's skewJoin cannot split a skewed
    BroadcastHashJoin probe side (no exchange to split), which is
    exactly the beyond-AQE case this helper exists for — so demos /
    production uses where Spark would auto-broadcast the replicated
    dimension should pass a shuffle hint."""
    s = skewed.withColumn("_salt", content_salt(skewed, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    if join_hint:
        replicated = replicated.hint(join_hint)
    return s.join(replicated, [key, "_salt"]).drop("_salt")
