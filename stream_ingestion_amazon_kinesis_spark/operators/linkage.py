"""Record linkage / fuzzy matching and null-safe join semantics
(SURVEY §2.3 G2 variants).

Entity resolution at corpus scale is the same shape as near-dup
detection (`operators/dedup.py`): never the full O(N²) cross product —
block on a cheap deterministic key so candidate pairs only form inside
a block, then score candidates with an edit-distance predicate. Here
the blocked self-join runs over the DISTINCT name vocabulary (entity
names repeat heavily in real catalogs; the vocabulary relation is
orders of magnitude smaller than the fact table), and the per-block
pair count is bounded by the block's vocabulary size, which the
blocking key keeps small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import as_double, money
from ..plans.registry import register
from ..sources.catalog import load_table

# Edit-distance threshold for a candidate pair to count as a fuzzy match
# (the fixture vocabulary's closest in-block pairs sit at distance 3,
# e.g. "blue bolt" ~ "blue rod").
_MAX_DIST = 3


@register(
    "fuzzy_name_pairs",
    oracle=f"""
    WITH names AS (
        SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS block
        FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev_dist
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    ORDER BY name_a, name_b
    """,
    description="G2 record linkage: fuzzy matching over the DISTINCT name "
    "vocabulary, blocked on the first token so pairs only form inside a "
    "block, scored with levenshtein <= 3 — the blocking-key + "
    "candidate-verify shape every entity-resolution pipeline uses at "
    "scale (the quadratic term is per-block vocabulary size, not corpus "
    "rows)",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join on the name vocabulary.

    Two scale properties make this safe at 100 TB: (1) the self-join
    input is `DISTINCT p_name` — vocabulary-sized, not fact-table-sized;
    (2) the equi-join on the blocking token means Spark shuffles each
    vocabulary entry once and pairs never cross blocks. Levenshtein runs
    only on in-block candidates (JVM built-in, no UDF). If a blocking
    key were pathologically hot, the same df-cap guard as
    `dedup.jaccard_neardup_pairs` applies; the first-token vocabulary
    here is bounded by construction.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn(
            "lev_dist",
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).cast("bigint"),
        )
        .filter(F.col("lev_dist") <= _MAX_DIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "lev_dist",
        )
        .orderBy("name_a", "name_b")
    )


@register(
    "nullsafe_join_status_buckets",
    oracle="""
    WITH b AS (
        SELECT nullif(o_orderstatus, 'O') AS status_bucket,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_price
        FROM orders
        GROUP BY 1
    ),
    l AS (
        SELECT DISTINCT nullif(o_orderstatus, 'O') AS status_bucket
        FROM orders
    )
    SELECT coalesce(l.status_bucket, 'OPEN') AS label,
           b.n_orders, b.total_price
    FROM b JOIN l ON b.status_bucket IS NOT DISTINCT FROM l.status_bucket
    ORDER BY label
    """,
    description="G2 null-safe equi-join (eqNullSafe / IS NOT DISTINCT "
    "FROM): a NULL-keyed group joins its NULL-keyed dimension row "
    "instead of silently dropping — the semantics ordinary equi-joins "
    "get wrong for nullable keys",
)
def nullsafe_join_status_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL keys are data here (nullif collapses the dominant status to
    NULL); `eqNullSafe` keeps the join a hash equi-join — Spark plans
    `<=>` exactly like `=` with null buckets co-partitioned, so there is
    no nested-loop penalty for null-safe semantics."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_bucket")
    bucketed = orders.groupBy(bucket).agg(
        F.count("*").alias("n_orders"),
        as_double(F.sum(money("o_totalprice"))).alias("total_price"),
    )
    labels = orders.select(bucket).distinct()
    return (
        bucketed.alias("b")
        .join(
            labels.alias("l"),
            F.col("b.status_bucket").eqNullSafe(F.col("l.status_bucket")),
        )
        .select(
            F.coalesce(F.col("l.status_bucket"), F.lit("OPEN")).alias("label"),
            "n_orders",
            "total_price",
        )
        .orderBy("label")
    )
