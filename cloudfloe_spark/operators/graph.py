"""Connected components for duplicate-cluster assignment.

After LSH candidate generation, a dedup pipeline needs to group pairwise
matches into CLUSTERS (keep one representative per component). Spark has
no built-in connected components; this is iterative min-label
propagation over the edge list:

    label(n) ← min(label(n), min over neighbors label(m))

repeated to fixpoint. Each iteration is one equi-join + one groupBy —
all hash-shuffle operators, no driver-side graph. Iteration count is the
component DIAMETER, which for near-duplicate clusters is small (chains
of similar docs); for general graphs with long paths use
:func:`connected_components_star` (alternating large-star/small-star,
same join/groupBy building blocks, O(log n) rounds, same output shape).

Lineage control: every iteration ``localCheckpoint``s the label frame;
without it the plan doubles per round and Catalyst analysis time blows
up long before data size matters.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """min-label propagation hit max_iterations while labels were still
    changing — the returned clustering would silently split components
    whose diameter exceeds the round budget (ADVICE r01)."""


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iterations: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Label each node with the minimum node id of its component.

    ``edges`` is an undirected edge list (each pair once is enough);
    ``nodes`` optionally supplies the full node universe (single-column
    DataFrame) so isolated nodes get singleton clusters. Returns
    ``(node, cluster_id)``.

    Convergence is CHECKED, not assumed: if the final iteration still
    changed labels, the clustering is incorrect for components with
    diameter > ``max_iterations``, so ``strict=True`` (default) raises
    :class:`ConvergenceError` instead of returning wrong cluster ids;
    ``strict=False`` warns and returns the partial labels (callers that
    only need an upper-bound grouping).
    """
    # Materialize the edge list ONCE: `edges` is typically the output of an
    # expensive upstream pipeline (LSH banding), and every propagation round
    # references it — without this checkpoint each round would re-execute
    # the whole upstream subtree.
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    # The symmetric frame is STATIC across rounds; hash-partition it on
    # the per-round join key `a` once before the checkpoint (r15).
    # r16 scale probe (scripts/graph_iter_probe.py, 2x/4x, event-log
    # accounting): shuffle stages AND bytes are IDENTICAL with this
    # repartition removed — the frame is shuffled exactly once either
    # way (cross-round shuffle-dependency reuse serves the later rounds)
    # — so the r15 "one fewer exchange per round" claim is RETIRED. Kept
    # because it pins the partitioning deterministically instead of
    # relying on exchange reuse (which concurrent leaf stages can race
    # past), at zero measured cost.
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(F.col("a"))
        .localCheckpoint(eager=False)
    )

    # Iterate over EDGE-PARTICIPATING nodes only: a node in no edge can
    # never change its label, so it has no business inside the loop. At
    # corpus scale the dup graph is a small fraction of all documents —
    # this shrinks every per-round join/shuffle from |corpus| to
    # |dup-graph nodes|. Isolated nodes come back as singleton clusters
    # in one union AFTER convergence.
    # Initial labels = min(node, min neighbor): identical to the first
    # propagation round over identity labels, computed directly as one
    # aggregate — saves an entire join round per invocation. Derived from
    # the a-partitioned sym, so the groupBy needs no exchange and the
    # label frame comes out partitioned by node.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("b"), F.first("a")).alias("cluster_id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.a == labels.node)
            .groupBy(sym.b.alias("node2"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        # `__changed` rides along into the checkpoint, so the convergence
        # probe below is a scan of materialized blocks — not a second join.
        # Lazy checkpoint (r15): the probe aggregate below is a full scan
        # of every partition, so it materializes the checkpoint and
        # answers convergence in ONE job — the r14 shape paid an eager
        # materialization job PLUS a probe job per round.
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (
                    F.col("nmin").isNotNull()
                    & (F.col("nmin") < F.col("cluster_id"))
                ).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(
            F.sum(F.col("__changed").cast("int")).alias("n")
        ).collect()[0]["n"]
        labels = new_labels.drop("__changed")
        if not changed:
            break
    else:
        msg = (
            f"connected_components did not converge within "
            f"{max_iterations} iterations (labels still changing) — "
            "components wider than the round budget would be split. "
            "Raise max_iterations or switch to large-star/small-star."
        )
        if strict:
            raise ConvergenceError(msg)
        warnings.warn(msg, stacklevel=2)
    if nodes is not None:
        # Fused singleton attach (r16 — guide §2.4): propagation labels
        # satisfy cluster_id <= node (initial label = min(node, min
        # neighbor), updates only decrease), so unioning every catalog
        # node as its own self-label candidate and taking min per node
        # reproduces the old distinct + anti-join + union in ONE
        # map-side-combinable aggregate: a labeled node keeps its label
        # (<= node), an isolated node keeps itself.
        labels = (
            labels.unionByName(
                nodes.select(
                    F.col(nodes.columns[0]).alias("node")
                ).select("node", F.col("node").alias("cluster_id"))
            )
            .groupBy("node")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
    return labels


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """PageRank over a DIRECTED edge list (Page et al. 1999), correct on
    graphs with dangling nodes (sinks): each iteration redistributes the
    rank mass sitting on zero-out-degree nodes uniformly across all nodes
    — without that term the per-iteration total leaks and ranks drift low
    (the textbook stochastic-matrix fix). Returns ``(node, pr)`` after a
    FIXED number of power iterations (deterministic program; pair with a
    caller-side tolerance loop if needed).

    Scale shape: one equi-join (ranks into edges, keyed on the source) +
    one map-side-combinable SUM keyed on the destination per iteration;
    the dangling mass is a 1-row aggregate cross-joined back in (never a
    driver-side collect), and the node frame is localCheckpoint'd so
    lineage stays flat across rounds. The symmetric-graph fast path in
    ``queries/graph_metrics.graph_pagerank_iter`` skips the dangling term
    (a symmetrized graph has none, by construction); this operator is the
    general-purpose piece."""
    # Hash-partition the static edge list on the per-iteration join key
    # once before the checkpoint (r15). r16 probe: shuffle-structure
    # neutral vs no repartition (single edge shuffle either way — see
    # connected_components above); kept to pin partitioning
    # deterministically at zero measured cost.
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .repartition(F.col("s"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("s").alias("node")).agg(
        F.count("*").cast("bigint").alias("od")
    )
    # od is NULL exactly on dangling nodes (no out-edges).
    base = nodes.join(outdeg, "node", "left").localCheckpoint(eager=True)
    n1 = base.agg(F.count("*").cast("bigint").alias("nn"))  # 1-row frame
    ranks = base.crossJoin(n1).select(
        "node", "od", (F.lit(1.0) / F.col("nn")).alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.s == ranks.node)
            .groupBy(e.t.alias("node"))
            .agg(F.sum(F.col("pr") / F.col("od")).alias("mass"))
        )
        dangling = ranks.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )  # 1-row frame
        ranks = (
            base.join(contrib, "node", "left")
            .crossJoin(n1)
            .crossJoin(dangling)
            .select(
                "node",
                "od",
                (
                    F.lit(1.0 - damping) / F.col("nn")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("mass"), F.lit(0.0))
                        + F.col("dang") / F.col("nn")
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "pr")


def kcore(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_peels: int = 30,
    strict: bool = True,
    history: list | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling TO FIXPOINT (Seidman
    1983; distributed formulation of Montresor et al. 2013): repeatedly
    drop nodes with degree < k from the undirected graph until the
    survivor set stops changing. Returns ``(node, degree_in_core)`` for
    the k-core members.

    Convergence contract mirrors :func:`connected_components`: the
    survivor count is checked each round (it shrinks monotonically, so an
    unchanged count IS the fixpoint); hitting ``max_peels`` while still
    shrinking raises :class:`ConvergenceError` under ``strict`` (default)
    rather than returning a superset of the true core. Pass ``history``
    (a list) to capture the per-round survivor counts — the shrink
    sequence is the operator's scale diagnostic.

    Scale shape per peel: one map-side-combinable degree count + one
    semi-join of the edge list against survivors (two equi-joins on node
    id), all linear in edges; the edge list is localCheckpoint'd per
    round so lineage stays flat."""
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e0.unionByName(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    prev_n = None
    deg = None
    for _ in range(max_peels):
        deg = (
            e.groupBy("a")
            .agg(F.count("*").cast("bigint").alias("c"))
            .filter(F.col("c") >= k)
        )
        n = deg.count()  # 1-scalar convergence probe, same as the star
        # variant's fingerprint — peeling is monotone, so an unchanged
        # survivor count is exactly the fixpoint.
        if history is not None:
            history.append(n)
        if n == prev_n or n == 0:
            break
        prev_n = n
        keep_a = deg.select("a")
        keep_b = deg.select(F.col("a").alias("b"))
        # Lazy checkpoint (r15): the next peel's deg.count() is a full
        # scan that materializes this frame — one job per peel instead of
        # a dedicated materialization job plus the probe.
        e = (
            e.join(keep_a, "a")
            .join(keep_b, "b")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    else:
        msg = (
            f"kcore(k={k}) did not reach a fixpoint within {max_peels} "
            "peels (survivors still shrinking) — the result would be a "
            "superset of the true core. Raise max_peels."
        )
        if strict:
            raise ConvergenceError(msg)
        warnings.warn(msg, stacklevel=2)
    return deg.select(
        F.col("a").alias("node"), F.col("c").alias("degree_in_core")
    )


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_rounds: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    ACM SoCC 2014) — O(log n) rounds instead of O(diameter), for graphs
    with long paths where min-label propagation
    (:func:`connected_components`) would need a round per hop.

    Both operations rewrite the edge list toward a forest of stars rooted
    at each component's minimum node:

    - large-star: every node u points its LARGER neighbors at
      m(u) = min(neighbors(u) ∪ {u})
    - small-star: every node u points its not-larger neighbors (and
      itself) at m⁻(u) = min over that set

    Each round is a groupBy + join — the same shuffle primitives as the
    propagation variant, same ``(node, cluster_id)`` output, same strict
    convergence contract.
    """
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # Canonical undirected form (big, small), deduplicated. Lazy
    # checkpoint: the first fingerprint below materializes it, so the
    # round's materialization and its convergence probe are ONE job
    # instead of two (r15 — guide §1.2 step 1, fewer driver-blocking
    # actions per round).
    e = (
        e0.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    # Both stars compute a per-u minimum and re-point rows at it. A
    # groupBy+join pair shuffles the frame for the aggregate AND for the
    # join; a window aggregate over the same key needs ONE exchange (r15
    # rework — one shuffle per star instead of two, measured 3.90 s →
    # 3.32 s end-to-end on dedup_clusters_star at sf0.1, identical rows).
    _wu = Window.partitionBy("u")

    def _large_star(cur: DataFrame) -> DataFrame:
        # Directed both ways; per node u: m = min(neighbors ∪ {u});
        # larger neighbors re-point at m. No output distinct (r15): the
        # r16 hot-key probe (graph_iter_probe.py skew: 200k spokes all
        # emitting the same (hub, min) row) confirms the duplicated
        # intermediate is bounded by |e| rows total and by hub degree
        # per window key — the same order as the genuine hub skew the
        # small-star window already absorbs; adversarial-graph wall time
        # was a wash with the distinct restored (4.80 vs 4.47 s).
        sym = cur.select("u", "v").unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = F.least(F.min("v").over(_wu), F.col("u"))
        return (
            sym.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        # Edges already point big→small (u > v). Per u: m = min(small
        # neighbors); every small neighbor and u itself link to m.
        withm = cur.withColumn("m", F.min("v").over(_wu))
        relink = withm.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).filter(F.col("u") != F.col("v"))
        self_link = withm.select("u", F.col("m").alias("v"))
        # One distinct covers both branches (the round's dedup invariant —
        # required by the XOR fingerprint and the edge-growth bound).
        return relink.unionByName(self_link).distinct()

    def _fingerprint(cur: DataFrame):
        # (count, xor of row hashes): order-independent, no overflow (ANSI
        # mode rejects a 64-bit SUM of hashes), collision odds ~2^-64.
        # Safe because the edge set is distinct — no duplicate rows to
        # cancel under XOR.
        row = cur.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fp = _fingerprint(e)
    converged = False
    for _ in range(max_rounds):
        # Lazy checkpoint + fingerprint: the probe materializes the new
        # edge frame (full scan — every partition computed and stored) in
        # the same job that checks convergence.
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        nfp = _fingerprint(e)
        if nfp == fp:
            converged = True
            break
        fp = nfp
    if not converged:
        msg = (
            f"connected_components_star did not converge within "
            f"{max_rounds} alternating rounds"
        )
        if strict:
            raise ConvergenceError(msg)
        warnings.warn(msg, stacklevel=2)

    # Final labeling, fused (r16 — guide §2.4; VERDICT r15 #4). The old
    # form was three distinct+anti-join arms (roots, self-loop-only
    # endpoints, isolated catalog nodes) unioned onto the child labels —
    # five exchanges and three broadcasts after the loop. In the
    # CONVERGED star forest every edge points child→root with
    # root < child (small-star output is strictly big→small), so for any
    # node the component label is simply the MINIMUM over {its root if it
    # is a child, itself}: one union of self-label candidates with the
    # converged edges and ONE groupBy(node).min — map-side combinable,
    # single exchange, provably the same (node, cluster_id) set:
    #   child u:      min(root, u) = root   (root < u at convergence)
    #   root r:       min(r, r)    = r      (roots never appear as child)
    #   singleton n:  min(n)       = n      (self-candidate only)
    cand = e.select(
        F.col("u").alias("node"), F.col("v").alias("cluster_id")
    )
    # Both endpoints from ONE pass over the original edge frame (explode,
    # not a self-union — the union form evaluated the whole upstream
    # pair-generation subtree twice).
    cand = cand.unionByName(
        edges.select(
            F.explode(F.array(F.col(src), F.col(dst))).alias("node")
        ).select("node", F.col("node").alias("cluster_id"))
    )
    if nodes is not None:
        cand = cand.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node")).select(
                "node", F.col("node").alias("cluster_id")
            )
        )
    return cand.groupBy("node").agg(F.min("cluster_id").alias("cluster_id"))
