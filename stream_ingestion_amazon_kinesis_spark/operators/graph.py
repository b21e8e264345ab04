"""Iterative graph analytics: PageRank by power iteration (SURVEY §2.3
G17-adjacent — the second iterative-fixpoint pattern next to
dedup.connected_components' label propagation).

Graph: supplier co-occurrence — a directed edge u->v with weight = the
number of orders in which both suppliers appear. Edge building is a
per-order self-join (quadratic per order, bounded by lines-per-order —
never corpus-quadratic), and the iteration is the textbook distributed
PageRank shape: ranks join edges on source, contributions shuffle to
destinations, one bounded-size rank relation per round.

Determinism is the interesting part at scale: float PageRank sums
accumulate in partition order and drift in the last ulp run-to-run.
Here ranks are integer micro-units (1e12 per node) and every operation
is integer multiply / truncating `div` / sum — associative and exact —
so 1 executor and 1000 executors produce bit-identical ranks, and the
oracle (the same three iterations unrolled as DuckDB CTEs) matches by
value hash. Rank mass: r*w products stay < 1e17 at fixture scale; at
a key domain where SUM(r*w) could pass 9.2e18, promote the sums to
DECIMAL(38,0) — the arithmetic stays exact either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

_SCALE = 1_000_000_000_000  # 1e12 micro-units of rank per node
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as an integer ratio
_ITERS = 3


def _edges_sql() -> str:
    """Co-occurrence edges as SQL (shared shape documentation for the
    oracle below): distinct (order, supplier) pairs self-joined per
    order, directed both ways, weighted by co-occurrence count."""
    return """
        WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        edges AS (
            SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
                   COUNT(*) AS w
            FROM os a JOIN os b
              ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
            GROUP BY a.l_suppkey, b.l_suppkey
        ),
        outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src)
    """


def _oracle() -> str:
    # Three power iterations unrolled; integer arithmetic identical to
    # the Spark side (truncating division, micro-unit scale).
    it = """
        r{n} AS (
            SELECT s.l_suppkey AS supp,
                   {teleport} + ({dnum} * COALESCE(inf.m, 0)) // {dden} AS r
            FROM (SELECT DISTINCT l_suppkey FROM lineitem) s
            LEFT JOIN (
                SELECT e.dst AS supp,
                       CAST(SUM((p.r * e.w) // o.ow) AS BIGINT) AS m
                FROM r{p} p
                JOIN edges e ON e.src = p.supp
                JOIN outw o ON o.src = p.supp
                GROUP BY e.dst
            ) inf ON inf.supp = s.l_suppkey
        )
    """
    teleport = (_SCALE * (_DAMP_DEN - _DAMP_NUM)) // _DAMP_DEN
    parts = [_edges_sql().strip().rstrip(), f", r0 AS (SELECT DISTINCT l_suppkey AS supp, {_SCALE} AS r FROM lineitem)"]
    for n in range(1, _ITERS + 1):
        parts.append(
            ","
            + it.format(
                n=n, p=n - 1, teleport=teleport, dnum=_DAMP_NUM, dden=_DAMP_DEN
            )
        )
    parts.append(
        f"""
        SELECT supp AS supplier, CAST(r AS BIGINT) AS rank_micro
        FROM r{_ITERS}
        ORDER BY rank_micro DESC, supplier
        """
    )
    return "\n".join(parts)


@register(
    "pagerank_supplier_cooccurrence",
    oracle=_oracle(),
    description="iterative graph analytics: 3 power iterations of "
    "damped PageRank over the supplier co-occurrence graph, all ranks "
    "in integer micro-units with truncating division so 1 and 1000 "
    "executors produce bit-identical ranks — oracle is the identical "
    "iterations unrolled as DuckDB CTEs",
)
def pagerank_supplier_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank, the Spark-idiomatic loop: the edge relation
    is built once and localCheckpointed (the iteration must not
    re-execute the self-join per round — dedup.connected_components
    lesson), each round is one join + one keyed shuffle, and only the
    bounded rank relation carries between rounds. O(iters) shuffles on
    the edge key, no driver-side data movement."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .localCheckpoint()  # iterations reuse edges; never re-join per round
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    srcw = edges.join(outw, "src")  # (src, dst, w, ow)

    nodes = os_.select(F.col("l_suppkey").alias("supp")).distinct()
    teleport = (_SCALE * (_DAMP_DEN - _DAMP_NUM)) // _DAMP_DEN
    ranks = nodes.withColumn("r", F.lit(_SCALE).cast("long"))
    for _ in range(_ITERS):
        inflow = (
            ranks.join(srcw, ranks.supp == srcw.src)
            .select(
                F.col("dst").alias("supp"),
                F.expr("(r * w) div ow").alias("contrib"),
            )
            .groupBy("supp")
            .agg(F.sum("contrib").alias("m"))
        )
        ranks = nodes.join(inflow, "supp", "left").select(
            "supp",
            (
                F.lit(teleport)
                + F.expr(
                    f"({_DAMP_NUM} * coalesce(m, 0L)) div {_DAMP_DEN}"
                )
            ).alias("r"),
        )
    return ranks.select(
        F.col("supp").alias("supplier"), F.col("r").cast("bigint").alias("rank_micro")
    ).orderBy(F.desc("rank_micro"), "supplier")


def _triangle_oracle() -> str:
    return """
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
    deg AS (
        SELECT k, COUNT(*) AS d
        FROM (SELECT u AS k FROM und UNION ALL SELECT v AS k FROM und)
        GROUP BY k),
    ori AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
        FROM und e
        JOIN deg du ON du.k = e.u
        JOIN deg dv ON dv.k = e.v),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM ori e1
        JOIN ori e2 ON e2.src = e1.dst
        JOIN ori e3 ON e3.src = e1.src AND e3.dst = e2.dst)
    SELECT supplier, COUNT(*) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS supplier FROM tri)
    GROUP BY supplier
    ORDER BY n_triangles DESC, supplier
    """


@register(
    "triangle_count_suppliers",
    oracle=_triangle_oracle(),
    description="per-supplier triangle counts in the co-occurrence "
    "graph via degeneracy-ordered edge orientation — each triangle "
    "enumerated exactly once from its lowest-(degree,id) corner, the "
    "wedge join bounded by oriented out-degree O(sqrt(m)) instead of "
    "raw degree",
)
def triangle_count_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting, the shuffle-bounded way: orient every
    undirected edge from its lower (degree, id) endpoint to the higher
    one — a total order, so the oriented graph is acyclic and every
    triangle {a,b,c} materializes exactly once as the wedge a->b->c
    closed by a->c. The wedge self-join fans out per ORIENTED
    out-degree, which the orientation bounds by O(sqrt(m)) on any
    graph (the arboricity bound) — a hub supplier co-occurring with
    thousands of others contributes its edges as wedge *endpoints*,
    never as a quadratic wedge *center*. Three equi-joins + one
    explode; no driver-side state."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("k"))
        .unionAll(und.select(F.col("v").alias("k")))
        .groupBy("k")
        .agg(F.count("*").alias("d"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    lower_first = F.struct(F.col("du.d"), F.col("u")) < F.struct(
        F.col("dv.d"), F.col("v")
    )
    ori = (
        und.join(du, F.col("du.k") == F.col("u"))
        .join(dv, F.col("dv.k") == F.col("v"))
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1, e2, e3 = ori.alias("e1"), ori.alias("e2"), ori.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("supplier"))
        .groupBy("supplier")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "supplier")
    )
