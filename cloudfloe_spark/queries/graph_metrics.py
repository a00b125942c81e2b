"""Graph metrics over derived co-occurrence graphs.

Complements ``operators/graph.py`` (connected components for dup clusters)
with the other classic distributed-graph primitive: triangle counting via
degree-ordered edge orientation (Suri & Vassilvitskii, WWW'11 — the
MapReduce-era construction that bounds the wedge join by orienting every
edge from its lower-degree endpoint, so a hub of degree d contributes
O(d) oriented out-edges instead of O(d²) wedges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


_MIN_SUPPORT = 2  # co-occurrence count below this is coincidence noise


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part co-purchase edges (src < dst): parts appearing
    together in at least ``_MIN_SUPPORT`` orders. The within-order
    self-join is keyed on the order id — order sizes are bounded (≤7
    lines in TPC-H), so the pair expansion is linear in the fact table,
    never quadratic in parts.

    The support threshold is the scale control, not a convenience: the
    support-1 graph is dominated by one-off coincidences (1.2M edges,
    avg degree ~120 at sf0.1) whose wedge space is O(m·d̄) — market-basket
    practice (a-priori support pruning) cuts it to the ~3.5k edges that
    carry signal, and the pruning itself is one map-side-combinable
    count over pairs, linear in the fact table.

    The (ok, pk) frame is hash-partitioned on the ORDER KEY before the
    distinct (r16): HashPartitioning(ok) satisfies the distinct's
    ClusteredDistribution([ok, pk]) by subset-key clustering AND is
    exactly what the self-join requires, so the dedup, both join sides
    (one ReusedExchange) and the join itself all ride one shuffle — the
    naive shape shuffled by (ok, pk) for the distinct and then re-shuffled
    each join side by ok. Interleaved A/B at sf0.1: subtree (noop sink)
    1.199 -> 0.771 s min-of-5; consumer-level graph_triangle_count
    2.398 -> 2.079, graph_pagerank_iter 2.473 -> 1.809, graph_kcore_peel
    2.045 -> 1.392 min-of-3 same-session. Partitioning-only change —
    row-identical output (asserted in the A/B and against the oracle)."""
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .repartition(F.col("ok"))
        .distinct()
    )
    a = pl.alias("a")
    b = pl.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _MIN_SUPPORT)
        .select("src", "dst")
    )


@register(
    "graph_triangle_count",
    oracle="""
        WITH pl AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        e AS (
            SELECT a.pk AS src, b.pk AS dst
            FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= 2
        ),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
            GROUP BY node
        ),
        o AS (
            SELECT CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)
                        THEN e.src ELSE e.dst END AS u,
                   CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)
                        THEN e.dst ELSE e.src END AS v
            FROM e
            JOIN deg ds ON ds.node = e.src
            JOIN deg dd ON dd.node = e.dst
        ),
        t AS (
            SELECT 1 AS one
            FROM o e1
            JOIN o e2 ON e2.u = e1.v
            JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS n_triangles
    """,
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the support-pruned part co-purchase graph,
    with node/edge totals — the clustering-structure probe for any derived
    similarity or co-occurrence graph (e.g. how clique-y are the LSH dup
    candidates?).

    Scale shape (the part that matters at 100 TB): edges are ORIENTED from
    the (degree, id)-smaller endpoint before the wedge join, so every
    wedge enumeration happens at its lowest-degree apex — total wedge work
    is O(Σ min-degree²) = O(m^{3/2}) instead of O(Σ d²), which a skewed
    hub graph turns quadratic. Both wedge-building and closure-checking
    are equi-joins (shuffle on node id / edge pair); nothing is
    broadcast-unbounded and no adjacency list is ever collected."""
    # The pruned edge list is referenced from five sub-plans (degrees ×2,
    # orientation, edge count, and transitively the three wedge joins);
    # without a lineage cap Spark re-runs the expensive pair-count
    # aggregation for each reference. localCheckpoint materializes the
    # ~thousands-of-rows edge list once — the same pattern the
    # connected-components operator uses (operators/graph.py:63).
    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    ds = deg.select(F.col("node").alias("src"), F.col("d").alias("d_src"))
    dd = deg.select(F.col("node").alias("dst"), F.col("d").alias("d_dst"))
    with_deg = e.join(ds, "src").join(dd, "dst")
    fwd = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    o = with_deg.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    e3 = o.alias("e3")
    wedges = e1.join(e2, F.col("e2.u") == F.col("e1.v")).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
    )
    tri = wedges.join(
        e3, (F.col("e3.u") == F.col("a")) & (F.col("e3.v") == F.col("c"))
    )
    n_nodes = deg.agg(F.count("*").cast("bigint").alias("n_nodes"))
    n_edges = e.agg(F.count("*").cast("bigint").alias("n_edges"))
    n_tri = tri.agg(F.count("*").cast("bigint").alias("n_triangles"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


_PR_DAMP = 0.85
_PR_ITERS = 3


@register(
    "graph_pagerank_iter",
    oracle=f"""
        WITH pl AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        und AS (
            SELECT a.pk AS src, b.pk AS dst
            FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= 2
        ),
        sym AS (
            SELECT src, dst FROM und
            UNION ALL SELECT dst AS src, src AS dst FROM und
        ),
        deg AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM sym GROUP BY src
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM deg),
        p0 AS (
            SELECT node, d, CAST(1.0 AS DOUBLE) / nn AS pr FROM deg, n
        ),
        p1 AS (
            SELECT s.dst AS node,
                   CAST(0.15 AS DOUBLE) / ANY_VALUE(n.nn)
                       + {_PR_DAMP} * SUM(p.pr / p.d) AS pr
            FROM sym s JOIN p0 p ON s.src = p.node CROSS JOIN n
            GROUP BY s.dst
        ),
        p1d AS (SELECT p.node, deg.d, p.pr FROM p1 p JOIN deg USING (node)),
        p2 AS (
            SELECT s.dst AS node,
                   CAST(0.15 AS DOUBLE) / ANY_VALUE(n.nn)
                       + {_PR_DAMP} * SUM(p.pr / p.d) AS pr
            FROM sym s JOIN p1d p ON s.src = p.node CROSS JOIN n
            GROUP BY s.dst
        ),
        p2d AS (SELECT p.node, deg.d, p.pr FROM p2 p JOIN deg USING (node)),
        p3 AS (
            SELECT s.dst AS node,
                   CAST(0.15 AS DOUBLE) / ANY_VALUE(n.nn)
                       + {_PR_DAMP} * SUM(p.pr / p.d) AS pr
            FROM sym s JOIN p2d p ON s.src = p.node CROSS JOIN n
            GROUP BY s.dst
        )
        SELECT node, ROUND(pr * 1000, 6) AS pr_millis FROM p3
    """,
    tags=("graph",),
)
def graph_pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (Page et al. 1999), {3} fixed power iterations at damping
    {0.85}, over the support-pruned co-purchase graph — the canonical
    importance score for any derived document/entity graph (e.g. weighting
    dup-cluster representatives by centrality). Fixed iteration count keeps
    the program deterministic; scores are reported per-mille and rounded so
    cross-engine float summation order is absorbed. The symmetric graph has
    no dangling nodes, so no leaked-mass correction term is needed — for
    directed graphs with sinks use :func:`operators.graph.pagerank` (the
    dangling-corrected general operator, proven by
    ``graph_pagerank_directed`` below).

    Scale shape: each iteration is ONE equi-join (ranks into the edge
    list, shuffle keyed on node id) + ONE map-side-combinable sum keyed on
    the destination — identical to the connected-components rounds that
    SCALING.md measures sublinear under skew. Degrees ride along in the
    rank frame, so the per-round join count stays at one; the edge list is
    localCheckpoint'd once and reused by all rounds. Hub skew salts the
    same way any hot groupBy key does (AQE skew-join handles it)."""
    sym0 = _copurchase_edges(spark, sf_dir)
    # Hash-partitioned on the per-iteration join key before the lazy
    # checkpoint (r15). r16 scale probe (scripts/graph_iter_probe.py,
    # 2x/4x): stages and shuffle bytes are IDENTICAL without this
    # repartition (AQE ReuseExchange covers the static frame inside the
    # one-job power loop), so the r15 per-iteration-exchange claim is
    # RETIRED; kept to pin the partitioning deterministically (reuse can
    # race under concurrent leaf stages) at zero measured cost.
    sym = (
        sym0.unionByName(
            sym0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(F.col("src"))
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    n1 = deg.agg(F.count("*").cast("bigint").alias("nn"))  # 1-row frame
    ranks = deg.crossJoin(n1).select(
        "node", "d", (F.lit(1.0) / F.col("nn")).alias("pr")
    )
    for _ in range(_PR_ITERS):
        msgs = (
            sym.join(ranks, sym.src == ranks.node)
            .groupBy(sym.dst.alias("node"))
            .agg(F.sum(F.col("pr") / F.col("d")).alias("mass"))
        )
        ranks = (
            msgs.crossJoin(n1)
            .select(
                "node",
                (F.lit(0.15) / F.col("nn") + F.lit(_PR_DAMP) * F.col("mass")).alias(
                    "pr"
                ),
            )
            .join(deg.select(F.col("node").alias("dn"), "d"), F.col("node") == F.col("dn"))
            .select("node", "d", "pr")
        )
    return ranks.select("node", F.round(F.col("pr") * 1000, 6).alias("pr_millis"))


@register(
    "graph_degree_histogram",
    oracle="""
        WITH pl AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        und AS (
            SELECT a.pk AS src, b.pk AS dst
            FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= 2
        ),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM (SELECT src AS node FROM und
                  UNION ALL SELECT dst AS node FROM und)
            GROUP BY node
        )
        SELECT CAST(FLOOR(LOG2(d)) AS BIGINT) AS degree_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(d) AS BIGINT) AS min_degree,
               CAST(MAX(d) AS BIGINT) AS max_degree
        FROM deg
        GROUP BY degree_bucket
    """,
    tags=("graph",),
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two degree histogram of the support-pruned co-purchase
    graph — the skew diagnostic run BEFORE any graph algorithm at scale
    (the bucket holding the max degree says whether wedge/propagation
    work needs salting; a heavy top bucket is the signal the triangle
    count's orientation and the LSH bucket cap exist for).

    Scale shape: one degree count keyed on the node, one map-side-combined
    rollup over <= 64 buckets. Nothing else."""
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    return deg.groupBy(
        F.floor(F.log2("d")).cast("bigint").alias("degree_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.min("d").cast("bigint").alias("min_degree"),
        F.max("d").cast("bigint").alias("max_degree"),
    )


_PR_DANG_SQL = f"""
        WITH pl AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        e AS (
            SELECT a.pk AS src, b.pk AS dst
            FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= 2
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        od AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS od
            FROM e GROUP BY src
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nodes),
        p0 AS (
            SELECT nd.node, od.od, CAST(1.0 AS DOUBLE) / n.nn AS pr
            FROM nodes nd LEFT JOIN od USING (node) CROSS JOIN n
        ),
        c1 AS (SELECT e.dst AS node, SUM(p.pr / p.od) AS mass
               FROM e JOIN p0 p ON e.src = p.node GROUP BY e.dst),
        g1 AS (SELECT COALESCE(SUM(pr), 0.0) AS dang FROM p0 WHERE od IS NULL),
        p1 AS (
            SELECT b.node, b.od,
                   {1 - _PR_DAMP} / n.nn + {_PR_DAMP} *
                       (COALESCE(c1.mass, 0) + g1.dang / n.nn) AS pr
            FROM p0 b LEFT JOIN c1 USING (node) CROSS JOIN n CROSS JOIN g1
        ),
        c2 AS (SELECT e.dst AS node, SUM(p.pr / p.od) AS mass
               FROM e JOIN p1 p ON e.src = p.node GROUP BY e.dst),
        g2 AS (SELECT COALESCE(SUM(pr), 0.0) AS dang FROM p1 WHERE od IS NULL),
        p2 AS (
            SELECT b.node, b.od,
                   {1 - _PR_DAMP} / n.nn + {_PR_DAMP} *
                       (COALESCE(c2.mass, 0) + g2.dang / n.nn) AS pr
            FROM p1 b LEFT JOIN c2 USING (node) CROSS JOIN n CROSS JOIN g2
        ),
        c3 AS (SELECT e.dst AS node, SUM(p.pr / p.od) AS mass
               FROM e JOIN p2 p ON e.src = p.node GROUP BY e.dst),
        g3 AS (SELECT COALESCE(SUM(pr), 0.0) AS dang FROM p2 WHERE od IS NULL),
        p3 AS (
            SELECT b.node, b.od,
                   {1 - _PR_DAMP} / n.nn + {_PR_DAMP} *
                       (COALESCE(c3.mass, 0) + g3.dang / n.nn) AS pr
            FROM p2 b LEFT JOIN c3 USING (node) CROSS JOIN n CROSS JOIN g3
        )
        SELECT node, ROUND(pr * 1000, 6) AS pr_millis FROM p3
"""


@register(
    "graph_pagerank_directed",
    oracle=_PR_DANG_SQL,
    tags=("graph",),
)
def graph_pagerank_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the DIRECTED co-purchase DAG (edges point lower→higher
    part id, so every locally-maximal part is a genuine sink) through the
    general :func:`operators.graph.pagerank` — the variant that is correct
    in the presence of dangling nodes: each iteration redistributes the
    rank mass stranded on sinks uniformly, keeping total mass at exactly
    1.0 (`graph_pagerank_iter` is the symmetric-graph fast path that can
    skip the term; this entry proves the general operator against a
    per-iteration SQL oracle with the same correction).

    Scale shape: identical join+sum rounds as the symmetric entry, plus a
    1-row dangling aggregate cross-joined back in (never collected)."""
    from cloudfloe_spark.operators.graph import pagerank

    pr = pagerank(
        _copurchase_edges(spark, sf_dir),
        damping=_PR_DAMP,
        iterations=_PR_ITERS,
    )
    return pr.select(
        "node", F.round(F.col("pr") * 1000, 6).alias("pr_millis")
    )


_KCORE_K = 4
_KCORE_PEELS = 3


@register(
    "graph_kcore_peel",
    oracle=f"""
        WITH pl AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        und AS (
            SELECT a.pk AS src, b.pk AS dst
            FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= 2
        ),
        e0 AS (
            SELECT src, dst FROM und
            UNION ALL SELECT dst AS src, src AS dst FROM und
        ),
        d1 AS (SELECT src, COUNT(*) AS c FROM e0 GROUP BY src
               HAVING COUNT(*) >= {_KCORE_K}),
        e1 AS (SELECT e.* FROM e0 e
               JOIN d1 a ON e.src = a.src JOIN d1 b ON e.dst = b.src),
        d2 AS (SELECT src, COUNT(*) AS c FROM e1 GROUP BY src
               HAVING COUNT(*) >= {_KCORE_K}),
        e2 AS (SELECT e.* FROM e1 e
               JOIN d2 a ON e.src = a.src JOIN d2 b ON e.dst = b.src),
        d3 AS (SELECT src, COUNT(*) AS c FROM e2 GROUP BY src
               HAVING COUNT(*) >= {_KCORE_K})
        SELECT src AS node, CAST(c AS BIGINT) AS degree_in_core
        FROM d3
    """,
    tags=("graph",),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    distributed formulation of Montresor et al.): repeatedly drop nodes
    with degree < {4} and recount — {3} fixed peels here (the fixture
    graph shrinks 865→505→245 survivors, still converging; the FIXPOINT
    form with the strict convergence contract is
    :func:`operators.graph.kcore`, proven by ``graph_kcore_fixpoint``
    below). The dense-subgraph extractor for spam rings and co-purchase
    cliques.

    Scale shape: each peel is one map-side-combinable degree count plus
    one semi-join-shaped filter of the edge list against surviving nodes
    (two equi-joins on node id) — all linear in edges, the same per-round
    primitives SCALING.md measures. No adjacency is ever collected."""
    sym0 = _copurchase_edges(spark, sf_dir)
    e = sym0.unionByName(
        sym0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = None
    for _ in range(_KCORE_PEELS):
        deg = (
            e.groupBy("src")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") >= _KCORE_K)
        )
        keep_src = deg.select("src")
        keep_dst = deg.select(F.col("src").alias("dst"))
        e = e.join(keep_src, "src").join(keep_dst, "dst").select("src", "dst")
    return deg.select(
        F.col("src").alias("node"), F.col("c").cast("bigint").alias("degree_in_core")
    )


_KCORE_FIX_K = 2
_KCORE_ORACLE_UNROLL = 12  # ≥ 2× the measured fixpoint depth at any test SF


def _kcore_unrolled_oracle(k: int, rounds: int) -> str:
    """Fixpoint k-core as SQL: ``rounds`` unrolled peel steps. Peeling is
    IDEMPOTENT once the fixpoint is reached (a peel of a stable survivor
    set is a no-op), so any unroll depth ≥ the actual fixpoint depth
    states the fixpoint exactly — measured depths here are 4 (sf0.01,
    1573→1538→1535 stable) and 6 (sf0.1, 1067→…→3 stable); 12 is 2×
    margin."""
    steps = [
        """
        pl AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        und AS (
            SELECT a.pk AS src, b.pk AS dst
            FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= 2
        ),
        e0 AS MATERIALIZED (
            SELECT src, dst FROM und
            UNION ALL SELECT dst AS src, src AS dst FROM und
        )"""
    ]
    prev = "e0"
    # AS MATERIALIZED is load-bearing: each step references its
    # predecessor twice (degree count + survivor join), so CTE inlining
    # would expand the chain exponentially (3^rounds lineitem scans —
    # observed as an fd exhaustion in DuckDB at 12 rounds).
    for i in range(1, rounds + 1):
        steps.append(
            f"""d{i} AS MATERIALIZED (
               SELECT src, COUNT(*) AS c FROM {prev} GROUP BY src
               HAVING COUNT(*) >= {k})"""
        )
        steps.append(
            f"""e{i} AS MATERIALIZED (SELECT e.* FROM {prev} e
               JOIN d{i} a ON e.src = a.src JOIN d{i} b ON e.dst = b.src)"""
        )
        prev = f"e{i}"
    return (
        "WITH "
        + ",\n        ".join(steps)
        + f"""
        SELECT src AS node, CAST(c AS BIGINT) AS degree_in_core
        FROM d{rounds}"""
    )


@register(
    "graph_kcore_fixpoint",
    oracle=_kcore_unrolled_oracle(_KCORE_FIX_K, _KCORE_ORACLE_UNROLL),
    tags=("graph",),
)
def graph_kcore_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {2}-core of the co-purchase graph peeled TO FIXPOINT through
    the general :func:`operators.graph.kcore` — the convergence-checked
    library piece (`graph_kcore_peel` above is the fixed-3-peel catalog
    shape; this entry proves the fixpoint semantics against an unrolled
    SQL oracle, which states the same fixpoint because peeling is
    idempotent once stable).

    Scale shape per peel: one combinable degree count + one survivor
    semi-join, linear in edges; the peel count is bounded by the strict
    :class:`ConvergenceError` contract, never assumed."""
    from cloudfloe_spark.operators.graph import kcore

    return kcore(
        _copurchase_edges(spark, sf_dir), _KCORE_FIX_K, max_peels=25
    )
