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


def _supplier_cooccurrence_edges(os_: DataFrame) -> DataFrame:
    """Directed co-occurrence edges (src, dst, w) from the distinct
    (order, supplier) relation — per-order self-join, bounded by
    suppliers-per-order. Factored so the pre-checkpoint plan stays
    pin/guard-visible via EXTRA_PLAN_BUILDERS (the caller eagerly
    checkpoints it for the power-iteration loop)."""
    a, b = os_.alias("a"), os_.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )


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
    # iterations reuse edges; never re-join per round
    edges = _supplier_cooccurrence_edges(os_).localCheckpoint()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # srcw feeds every iteration's join and nodes feeds the init rank
    # plus every iteration's left join — without materialization each
    # iteration re-runs the out-weight aggregate+join (edge-sized) and
    # the supplier distinct (a full checkpointed-edges/lineitem pass):
    # 3 iterations executed those subtrees 3x and 4x respectively
    # (measured 1.14 -> 0.77 s warm at sf0.1). LAZY so the work stays
    # inside the first consuming job.
    srcw = edges.join(outw, "src").localCheckpoint(eager=False)  # (src, dst, w, ow)

    nodes = (
        os_.select(F.col("l_suppkey").alias("supp"))
        .distinct()
        .localCheckpoint(eager=False)
    )
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
    WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
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
    SELECT part, COUNT(*) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS part FROM tri)
    GROUP BY part
    ORDER BY n_triangles DESC, part
    """


@register(
    "triangle_count_parts",
    oracle=_triangle_oracle(),
    description="per-part triangle counts in the co-occurrence "
    "graph: degeneracy-ordered edge orientation + per-edge adjacency "
    "intersection, so each triangle is enumerated exactly once and "
    "nothing larger than the triangle set itself ever materializes",
)
def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting by edge-iterator with oriented adjacency
    arrays: orient every undirected edge from its lower (degree, id)
    endpoint to the higher one — a total order, so the oriented graph
    is acyclic and every triangle {a,b,c} appears exactly once as edge
    (a,b) with c in adj(a) INTERSECT adj(b). Adjacency lists are built
    per ORIENTED out-degree, which the orientation bounds by O(sqrt(m))
    (the arboricity bound) — a hub part contributes its edges as list
    *members*, never as a quadratic list *owner* — so each collect_list
    is bounded and the per-edge array_intersect is JVM-vectorized work.
    Unlike the textbook wedge self-join (measured 2-3x slower here:
    it materializes every open wedge before the closing join filters
    them), the intersection form never shuffles anything larger than
    the edge relation + the triangle output itself.

    Both `und` and `ori` are localCheckpointed: the plan references
    `und` ~5x (directly + twice through deg) and `ori` 3x (directly +
    twice through adj), static ReusedExchange is 0, and AQE's runtime
    reuse does not reliably fire across the subtree copies — measured
    at sf0.1: 13.1s -> 4.5s cold, 5.2s -> 2.9-4.2s hot. Each
    checkpoint materializes exactly the edge relation (bounded by m),
    executor-local. (A DISK_ONLY-persist variant was measured and
    REJECTED: it also passes the 1 GiB vanilla sweep but at 48s vs
    9.7s, and the 16 GiB warm path regressed 4x — the checkpoint
    blocks were never the dominant OOM cause, the sorts below were.)

    Per-task memory cap: the two adjacency joins carry a SHUFFLE_HASH
    hint on the adj side. Sort-merge (Spark's default pick here) runs
    an UnsafeExternalSorter over the array-bearing joined stream in
    every one of the 32 concurrent tasks — 1 MB page acquisitions, the
    measured OOM site that killed a bare 1 GiB driver at sf0.1 —
    while shuffle-hash only builds a hash map over the per-partition
    slice of adj (node-bounded rows whose arrays the orientation
    already caps at O(sqrt(m))) and STREAMS the fat edge side with no
    sort at all. With the hints the same bare-driver sweep goes from
    hard OOM to green in ~8s. At cluster scale the hint stays safe:
    the build side is the strictly smaller adjacency relation, hash
    partitioned on the join key, and per-task build size is tuned by
    shuffle partition count, not data volume. (A bucket-chunked
    adjacency variant — split each nbrs list into 16 value buckets to
    also bound per-ROW size — was measured and REJECTED: it passes the
    same vanilla sweep no better than the hints alone while its edge
    fan-out made the warm 16 GiB path 4-5x slower.)"""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_partkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint()
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
        .localCheckpoint()
    )
    adj = ori.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    au = adj.select(F.col("src").alias("_u"), F.col("nbrs").alias("nbrs_u"))
    av = adj.select(F.col("src").alias("_v"), F.col("nbrs").alias("nbrs_v"))
    tri = (
        ori.join(au.hint("shuffle_hash"), F.col("src") == F.col("_u"))
        .join(av.hint("shuffle_hash"), F.col("dst") == F.col("_v"))
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.explode(F.array_intersect("nbrs_u", "nbrs_v")).alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "part")
    )


def _linkpred_oracle() -> str:
    return """
    WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2),
    nbr AS (
        SELECT u AS node, v AS nbr FROM und
        UNION ALL
        SELECT v AS node, u AS nbr FROM und),
    wedge AS (
        SELECT a.node AS x, b.node AS y, COUNT(*) AS common_neighbors
        FROM nbr a JOIN nbr b
          ON a.nbr = b.nbr AND a.node < b.node
        GROUP BY 1, 2),
    pred AS (
        SELECT w.x, w.y, w.common_neighbors
        FROM wedge w
        LEFT JOIN und e ON e.u = w.x AND e.v = w.y
        WHERE e.u IS NULL)
    SELECT x AS part_a, y AS part_b, CAST(common_neighbors AS BIGINT)
               AS common_neighbors
    FROM pred
    ORDER BY common_neighbors DESC, part_a, part_b
    LIMIT 20
    """


@register(
    "link_prediction_common_neighbors",
    oracle=_linkpred_oracle(),
    description="link prediction on the part co-occurrence graph: "
    "top-20 NON-edges ranked by common-neighbor count — wedge "
    "generation through each shared neighbor, anti-join against "
    "existing edges, the co-purchase recommender primitive",
)
def link_prediction_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict the missing edges: for every non-adjacent pair, count
    shared neighbors (the common-neighbors score that Adamic-Adar
    refines). The wedge self-join through the shared neighbor is the
    same bounded pattern as triangle counting — each neighbor of
    degree d contributes d^2 wedge pairs, so the hub cap that keeps
    triangles tractable governs this too; the anti-join against the
    edge relation then removes already-connected pairs. Counts are
    plain integers, the ranking carries a total (score, a, b)
    tiebreak. The graph keeps only REPEAT co-occurrences (>= 2 shared
    orders): incidental one-off pairings are noise for prediction, and
    the support floor is also what keeps the wedge volume
    Theta(sum deg^2) bounded — the same lever a 100 TB co-purchase
    graph would tune (measured here: 57 s -> ~2 s at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_partkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        # und feeds both nbr arms AND the closing anti-join — three
        # subtree copies of the order self-join without materialization
        # (lazy: runs inside the consuming job; measured 3.1 -> 1.9 s
        # at sf0.1, build included).
        .localCheckpoint(eager=False)
    )
    nbr = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    na, nb = nbr.alias("na"), nbr.alias("nb")
    wedge = (
        na.join(
            nb,
            (F.col("na.nbr") == F.col("nb.nbr"))
            & (F.col("na.node") < F.col("nb.node")),
        )
        .groupBy(F.col("na.node").alias("x"), F.col("nb.node").alias("y"))
        .agg(F.count("*").alias("common_neighbors"))
    )
    pred = wedge.join(
        und,
        (F.col("u") == F.col("x")) & (F.col("v") == F.col("y")),
        "left_anti",
    )
    return (
        pred.select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("common_neighbors").cast("bigint").alias("common_neighbors"),
        )
        .orderBy(F.desc("common_neighbors"), "part_a", "part_b")
        .limit(20)
    )


_KCORE_K = 3
_KCORE_MAX_PEELS = 12


def _kcore_oracle() -> str:
    """Unrolled peeling twin: each CTE level keeps nodes whose degree
    within the previous level's survivor set is >= k. _KCORE_MAX_PEELS
    levels; the Spark side RAISES if convergence needs more, so the
    unrolling bound is sound (same contract as the components
    unrolled-CTE oracle)."""
    base = """
    WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2),
    nbr AS MATERIALIZED (
        SELECT u AS node, v AS nbr FROM und
        UNION ALL
        SELECT v AS node, u AS nbr FROM und),
    keep0 AS MATERIALIZED (SELECT DISTINCT node FROM nbr)"""
    levels = []
    for i in range(1, _KCORE_MAX_PEELS + 1):
        levels.append(f""",
    keep{i} AS MATERIALIZED (
        SELECT n.node
        FROM nbr n
        JOIN keep{i-1} s  ON s.node = n.node
        JOIN keep{i-1} s2 ON s2.node = n.nbr
        GROUP BY n.node
        HAVING COUNT(*) >= {_KCORE_K})""")
    final = f"""
    SELECT k.node AS part, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM keep{_KCORE_MAX_PEELS} k
    JOIN nbr n ON n.node = k.node
    JOIN keep{_KCORE_MAX_PEELS} s ON s.node = n.nbr
    GROUP BY k.node
    ORDER BY part
    """
    return base + "".join(levels) + final


@register(
    "kcore_parts",
    oracle=_kcore_oracle(),
    description=f"k-core decomposition (k={_KCORE_K}) of the repeat "
    "co-occurrence part graph: iterative peeling of nodes with "
    "in-survivor degree < k until fixpoint — the subgraph-density "
    "primitive; oracle is the peeling unrolled as CTE levels",
)
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative peeling with the engine's fixpoint discipline: the
    edge relation is built once and localCheckpointed; each round
    recomputes in-survivor degrees (one shuffle over surviving
    edges) and drops nodes below k; the loop stops when the survivor
    count is stable and RAISES if _KCORE_MAX_PEELS rounds don't
    converge — so the unrolled oracle's depth bound is verified, not
    assumed. Survivor sets shrink monotonically, so per-round cost
    falls; at 100 TB each round is one degree-aggregate + one
    semi-join, the same shape as distributed k-core in Pregel-class
    systems, with no per-node state beyond the current survivor
    flag."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_partkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .localCheckpoint()
    )
    nbr = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    keep = nbr.select("node").distinct().localCheckpoint()
    n_prev = keep.count()
    for _ in range(_KCORE_MAX_PEELS):
        survivors_edges = nbr.join(
            keep, "node", "left_semi"
        ).join(keep.select(F.col("node").alias("nbr")), "nbr", "left_semi")
        keep = (
            survivors_edges.groupBy("node")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("node")
            .localCheckpoint()
        )
        n_now = keep.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    else:
        raise RuntimeError(
            f"kcore_parts: no fixpoint within {_KCORE_MAX_PEELS} peels "
            "— raise _KCORE_MAX_PEELS (and the oracle unrolling) together"
        )
    core_edges = nbr.join(keep, "node", "left_semi").join(
        keep.select(F.col("node").alias("nbr")), "nbr", "left_semi"
    )
    return (
        core_edges.groupBy(F.col("node").alias("part"))
        .agg(F.count("*").cast("bigint").alias("core_degree"))
        .orderBy("part")
    )


@register(
    "degree_assortativity_parts",
    oracle="""
    WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2),
    deg AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS k FROM und UNION ALL SELECT v AS k FROM und)
        GROUP BY k),
    e AS (
        SELECT du.d AS x, dv.d AS y
        FROM und JOIN deg du ON du.k = und.u
                 JOIN deg dv ON dv.k = und.v),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x + y) AS BIGINT) AS s1,
               CAST(SUM(x*x + y*y) AS BIGINT) AS s2,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM e)
    SELECT m, s1, s2, sxy,
           CAST(4 * m * sxy - s1 * s1 AS BIGINT) AS num,
           CAST(2 * m * s2 - s1 * s1 AS BIGINT) AS den
    FROM sums
    """,
    description="degree assortativity of the repeat co-occurrence "
    "graph: Newman's r as the EXACT integer pair (num, den) from edge "
    "degree power sums (r = num/den), plus the raw sums — do hubs "
    "connect to hubs? one scan over edges joined to the degree "
    "relation",
)
def degree_assortativity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-level mixing statistic: Newman's degree assortativity
    over undirected edges reduces to three power sums over edge
    endpoint degrees — Σ(x+y), Σ(x²+y²), Σxy — combined as
    r = (4m·Σxy − (Σ(x+y))²) / (2m·Σ(x²+y²) − (Σ(x+y))²). Everything
    stays int64 (degrees are bounded by the co-occurrence support
    floor; products < 1e18 at fixture scale — promote to
    DECIMAL(38,0) for denser graphs), so the compared values are
    exact; the float r is left to the consumer. Two joins against the
    bounded degree relation, one single-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_partkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        # und feeds both deg arms AND the edge join — four subtree
        # copies of the order self-join without materialization (lazy;
        # measured 2.9 -> 1.7 s at sf0.1, build included).
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("k"))
        .unionAll(und.select(F.col("v").alias("k")))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    e = (
        und.join(du, F.col("du.k") == F.col("u"))
        .join(dv, F.col("dv.k") == F.col("v"))
        .select(F.col("du.d").alias("x"), F.col("dv.d").alias("y"))
    )
    sums = e.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum(F.col("x") + F.col("y")).cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x") + F.col("y") * F.col("y"))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    return sums.select(
        "m",
        "s1",
        "s2",
        "sxy",
        (4 * F.col("m") * F.col("sxy") - F.col("s1") * F.col("s1"))
        .cast("bigint")
        .alias("num"),
        (2 * F.col("m") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("bigint")
        .alias("den"),
    )


def _lpa_round_sql(prev: str, out: str) -> str:
    """One unrolled weighted-LPA round as DuckDB CTE text."""
    return f"""
    n{out} AS (
        SELECT e.src AS node, l.label, CAST(SUM(e.w) AS BIGINT) AS c
        FROM e0 e JOIN {prev} l ON l.node = e.dst
        GROUP BY 1, 2),
    {out} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, label) AS rn
            FROM n{out})
        WHERE rn = 1)"""


@register(
    "label_propagation_communities",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM e0),
    {_lpa_round_sql('l0', 'l1')},
    {_lpa_round_sql('l1', 'l2')}
    SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l2 GROUP BY 1
    ORDER BY n_members DESC, community
    """,
    description="iterative graph analytics: 2 rounds of deterministic "
    "weighted label propagation over the part co-occurrence graph "
    "(votes weighted by co-occurrence count, ties to the smallest "
    "label) — community size histogram; oracle is the identical rounds "
    "unrolled as CTEs",
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous weighted LPA (Raghavan et al.
    2007), made deterministic: every node adopts the neighbor label
    with the highest edge-weight vote, ties to the smallest label —
    no randomized update order, so 1 and 1000 executors agree.

    Spark shape: the support-floored (w >= 2) co-occurrence edge
    relation is built once and localCheckpointed (feeds both rounds —
    the pagerank/kcore lesson); each round is one join + one (node,
    label) aggregate + one per-node argmax window. O(rounds) shuffles
    on the edge key; only the |nodes| label relation carries between
    rounds. The support floor keeps the co-occurrence graph sparse
    (part cardinality grows with data — see STATE.md graph-key lesson).
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    rank_w = W.partitionBy("node").orderBy(F.desc("c"), "label")
    for _ in range(2):
        votes = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("n2"), "label")
            .agg(F.sum("w").alias("c"))
            .withColumnRenamed("n2", "node")
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
    )


_PPR_ITERS = 3


def _ppr_oracle() -> str:
    # Every CTE is MATERIALIZED: DuckDB otherwise INLINES each reference,
    # so pr3 -> pr2 -> pr1 re-expands the part-pair self-join (e0) once
    # per iteration per reference — at sf1 (6M lineitem) the inlined plan
    # ran 752 s in round 6 and OOMed the round-7 full gate. Materialized,
    # each relation is computed exactly once (same values, same rounding;
    # the k-core oracle set this precedent).
    it = """
        pr{n} AS MATERIALIZED (
            SELECT nd.node,
                   CASE WHEN sd.node IS NOT NULL THEN (SELECT ps FROM consts)
                        ELSE 0 END
                   + (85 * COALESCE(inf.m, 0)) // 100 AS r
            FROM nodes nd
            LEFT JOIN seeds sd ON sd.node = nd.node
            LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(SUM((p.r * e.w) // o.ow) AS BIGINT) AS m
                FROM pr{p} p
                JOIN e0 e ON e.src = p.node
                JOIN outw o ON o.src = p.node
                GROUP BY e.dst
            ) inf ON inf.node = nd.node
        )
    """
    parts = [
        """
    WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0),
    outw AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM e0 GROUP BY 1),
    seeds AS MATERIALIZED (
        SELECT n.node FROM nodes n
        JOIN part p ON p.p_partkey = n.node
        WHERE p.p_size <= 5),
    consts AS MATERIALIZED (
        SELECT ((SELECT COUNT(*) FROM nodes) * 1000000000000 * 15 // 100)
               // (SELECT COUNT(*) FROM seeds) AS ps),
    pr0 AS MATERIALIZED (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes)
    """
    ]
    for n in range(1, _PPR_ITERS + 1):
        parts.append("," + it.format(n=n, p=n - 1))
    parts.append(
        f"""
        SELECT node AS part, CAST(r AS BIGINT) AS rank_micro
        FROM pr{_PPR_ITERS}
        ORDER BY rank_micro DESC, part
        LIMIT 50
        """
    )
    return "\n".join(parts)


@register(
    "personalized_pagerank_parts",
    oracle=_ppr_oracle(),
    description="iterative graph analytics: 3 iterations of PERSONALIZED "
    "PageRank over the support-floored part co-occurrence graph — "
    "teleport mass flows only to the small-part seed set (p_size <= 5), "
    "so ranks measure proximity TO THE SEEDS, not global centrality; "
    "same integer micro-unit / truncating-division determinism as the "
    "global PageRank, oracle = identical unrolled iterations",
)
def personalized_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-sensitive PageRank: recommendations 'near' a seed set.

    Identical distributed shape to `pagerank_supplier_cooccurrence`
    (localCheckpointed edges, one join + keyed shuffle per round, only
    the |nodes| rank relation carried), with the teleport term
    restricted to seed nodes. The two scalar constants (node and seed
    counts) are bounded single-value actions folded into literals —
    the quantizer-collect pattern. Top-50 readout bounds the compared
    surface.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    seeds = nodes.join(
        part.filter(F.col("p_size") <= 5),
        nodes.node == part.p_partkey,
        "left_semi",
    ).localCheckpoint()
    n_nodes = nodes.count()
    n_seeds = seeds.count()
    scale = 1_000_000_000_000
    per_seed = (n_nodes * scale * 15 // 100) // n_seeds
    srcw = edges.join(outw, "src")
    seeds_flag = seeds.withColumn("is_seed", F.lit(True))
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    for _ in range(_PPR_ITERS):
        inflow = (
            ranks.join(srcw, ranks.node == srcw.src)
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * w) div ow").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").cast("long").alias("m"))
        )
        ranks = (
            nodes.join(seeds_flag, "node", "left")
            .join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed"), F.lit(per_seed)).otherwise(0)
                    + F.expr("(85 * coalesce(m, 0L)) div 100")
                ).cast("long").alias("r"),
            )
        )
    # Top-50 readout: orderBy+limit is a TakeOrderedAndProject (partial
    # top-50 per partition, driver merge) — the earlier row_number
    # window moved the whole |parts| rank relation into one partition
    # just to cut the head, and the rank ordinal never reached the
    # output anyway.
    return (
        ranks.orderBy(F.desc("r"), "node")
        .limit(50)
        .select(
            F.col("node").alias("part"),
            F.col("r").cast("bigint").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "part")
    )


@register(
    "two_hop_reach_centrality",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    hop1 AS (SELECT DISTINCT src AS node, dst AS r FROM e0),
    hop2 AS (
        SELECT DISTINCT h.node, e.dst AS r
        FROM hop1 h JOIN e0 e ON e.src = h.r
        WHERE e.dst <> h.node),
    n1 AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d1 FROM hop1 GROUP BY 1),
    new2 AS (
        SELECT h2.node, CAST(COUNT(*) AS BIGINT) AS d2
        FROM hop2 h2
        LEFT JOIN hop1 h1 ON h1.node = h2.node AND h1.r = h2.r
        WHERE h1.r IS NULL
        GROUP BY 1),
    scored AS (
        SELECT n1.node, n1.d1, COALESCE(new2.d2, 0) AS d2,
               2 * n1.d1 + COALESCE(new2.d2, 0) AS harmonic_half
        FROM n1 LEFT JOIN new2 USING (node))
    SELECT node AS part, d1, d2, harmonic_half,
           CAST(ROW_NUMBER() OVER (ORDER BY harmonic_half DESC, node)
                AS BIGINT) AS rnk
    FROM scored
    QUALIFY rnk <= 30
    ORDER BY rnk
    """,
    description="graph centrality: 2-hop harmonic reach per part "
    "(2*|dist-1 neighbors| + |new dist-2 neighbors|, the truncated "
    "harmonic centrality in half-units — no floats), top-30 over the "
    "support-floored co-occurrence graph",
)
def two_hop_reach_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality (radius 2), exact integers.

    hop2 is the one expensive relation — edges joined to edges, kept
    DISTINCT per (node, reached) so it never exceeds |nodes|^2 and in
    sparse graphs stays near sum-of-squared-degrees; the support floor
    is the lever that keeps degrees bounded (STATE.md graph lesson).
    Distance-2-only neighbors come from an anti-join against hop1 —
    no shortest-path machinery needed at radius 2. Harmonic weights
    1 + 1/2 are doubled into integers (2, 1). Top-30 selection is
    orderBy+limit (TakeOrderedAndProject: per-partition partial top-30,
    driver merge) with row_number only over the 30-row slice — ranking
    the full |parts|-sized score relation in one partition, the
    previous form, is the 100x scale killer this avoids.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
        .localCheckpoint()
    )
    hop1 = edges.select(F.col("src").alias("node"), F.col("dst").alias("r")).distinct()
    e2 = edges.select(F.col("src").alias("r"), F.col("dst").alias("r2"))
    hop2 = (
        hop1.join(e2, "r")
        .filter(F.col("r2") != F.col("node"))
        .select("node", F.col("r2").alias("r"))
        .distinct()
    )
    n1 = hop1.groupBy("node").agg(F.count("*").alias("d1"))
    new2 = (
        hop2.join(hop1, ["node", "r"], "left_anti")
        .groupBy("node")
        .agg(F.count("*").alias("d2"))
    )
    scored = (
        n1.join(new2, "node", "left")
        .withColumn("d2", F.coalesce("d2", F.lit(0)).cast("bigint"))
        .withColumn("harmonic_half", 2 * F.col("d1") + F.col("d2"))
    )
    top = scored.orderBy(F.desc("harmonic_half"), "node").limit(30)
    w = W.orderBy(F.desc("harmonic_half"), "node")  # 30-row slice only
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .select(
            F.col("node").alias("part"),
            F.col("d1").cast("bigint").alias("d1"),
            "d2",
            F.col("harmonic_half").cast("bigint").alias("harmonic_half"),
            "rnk",
        )
        .orderBy("rnk")
    )


# --- Bounded BFS layers (frontier joins) -------------------------------
#
# The distributed BFS shape every graph engine reduces to: per round,
# the FRONTIER (not the graph, not the visited set) drives one equi-join
# against the edge relation, an anti-join against visited prunes
# re-discoveries, and only the frontier/visited node relations carry
# state between rounds. Depth is bounded (3), so the plan is 3 bounded
# join rounds over a localCheckpointed edge relation — the same
# fixpoint discipline as pagerank/connected_components. Seeds are the
# 4 lowest part keys; distances are min-hop by construction (a node
# enters at its FIRST discovery round and is pruned forever after).
BFS_MAX_DEPTH = 3
BFS_SEEDS = 8  # parts with partkey < BFS_SEEDS
BFS_MIN_W = 2  # repeat-co-occurrence edges only (sparse backbone)


def _bfs_oracle() -> str:
    layers = ["""
    l0 AS (SELECT DISTINCT l_partkey AS n FROM lineitem
           WHERE l_partkey < {seeds})""".format(seeds=BFS_SEEDS)]
    seen = "SELECT n FROM l0"
    for d in range(1, BFS_MAX_DEPTH + 1):
        layers.append(f"""
    l{d} AS (
        SELECT DISTINCT e.dst AS n
        FROM l{d - 1} f JOIN edges e ON e.src = f.n
        WHERE e.dst NOT IN ({seen}))""")
        seen += f" UNION SELECT n FROM l{d}"
    union_layers = " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS dist, n FROM l{d}"
        for d in range(BFS_MAX_DEPTH + 1)
    )
    return f"""
    WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    {",".join(layers)},
    lay AS ({union_layers}),
    unreached AS (
        SELECT CAST(-1 AS BIGINT) AS dist, l_partkey AS n
        FROM (SELECT DISTINCT l_partkey FROM lineitem)
        WHERE l_partkey NOT IN (SELECT n FROM lay)),
    allrows AS (SELECT * FROM lay UNION ALL SELECT * FROM unreached)
    SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(n) AS BIGINT) AS node_checksum
    FROM allrows GROUP BY dist ORDER BY dist
    """


@register(
    "bfs_reach_layers_parts",
    oracle=_bfs_oracle(),
    description=f"iterative graph analytics: bounded BFS (depth "
    f"{BFS_MAX_DEPTH}) from the {BFS_SEEDS} lowest part keys over "
    "the co-occurrence graph via frontier equi-joins + visited "
    "anti-joins — per-distance census with node checksum, exact "
    "unrolled-layer DuckDB oracle (incl. the unreached remainder)",
)
def bfs_reach_layers_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frontier-driven BFS: each round shuffles only the frontier
    against the edge key (never the visited set, never the full graph),
    the visited relation grows monotonically and is anti-joined to
    prune re-discoveries, and both carry across rounds as
    localCheckpointed bounded relations. At 100 TB this is the plan a
    Pregel superstep compiles to — per-round cost proportional to the
    frontier's edge fan-out. Census output (per-distance node count +
    checksum) value-checks the exact layer SETS, min-hop semantics
    included, against the unrolled oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_partkey").distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= BFS_MIN_W)
        .select("src", "dst")
        .localCheckpoint()  # 3 frontier rounds reuse edges
    )
    nodes = os_.select(F.col("l_partkey").alias("n")).distinct()
    frontier = nodes.filter(F.col("n") < BFS_SEEDS).localCheckpoint()
    visited = frontier.withColumn("dist", F.lit(0).cast("bigint"))
    layers = [visited]
    for d in range(1, BFS_MAX_DEPTH + 1):
        nxt = (
            frontier.join(edges, frontier.n == edges.src)
            .select(F.col("dst").alias("n"))
            .distinct()
            .join(visited.select("n"), "n", "left_anti")
            .localCheckpoint()
        )
        layer = nxt.withColumn("dist", F.lit(d).cast("bigint"))
        layers.append(layer)
        visited = visited.unionByName(layer).localCheckpoint()
        frontier = nxt
    unreached = nodes.join(visited.select("n"), "n", "left_anti").withColumn(
        "dist", F.lit(-1).cast("bigint")
    )
    allrows = visited.unionByName(unreached)
    return (
        allrows.groupBy("dist")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.sum("n").cast("bigint").alias("node_checksum"),
        )
        .orderBy("dist")
    )


# --- Pre-checkpoint plan exposure (ADVICE r11 / verdict r9 #2) --------
# pagerank's srcw is lazily checkpointed (and edges eagerly), hiding
# the per-order self-join + out-weight join from the plan pins; this
# builder re-composes the un-checkpointed subtree.
from ..plans.registry import EXTRA_PLAN_BUILDERS as _EXTRA  # noqa: E402


def _pagerank_srcw_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    os_ = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    edges = _supplier_cooccurrence_edges(os_)
    return edges.join(edges.groupBy("src").agg(F.sum("w").alias("ow")), "src")


_EXTRA["pagerank_supplier_cooccurrence::srcw"] = _pagerank_srcw_plan
