"""Connected-components unit tests (fixture-level correctness is pinned
by the dedup_minhash_clusters oracle test)."""

from __future__ import annotations

import pytest

from cloudfloe_spark.operators.graph import ConvergenceError, connected_components


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long") if nodes else None
    return {
        r["node"]: r["cluster_id"]
        for r in connected_components(e, nodes=n).collect()
    }


def test_chain_and_islands(spark):
    got = _cc(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_long_chain_converges(spark):
    """A 12-node path needs multiple propagation rounds."""
    got = _cc(spark, [(i, i + 1) for i in range(12)])
    assert set(got.values()) == {0} and len(got) == 13


def test_isolated_nodes_get_singleton_clusters(spark):
    got = _cc(spark, [(1, 2)], nodes=[1, 2, 9, 10])
    assert got[9] == 9 and got[10] == 10 and got[1] == got[2] == 1


def test_cycle(spark):
    got = _cc(spark, [(3, 4), (4, 5), (5, 3)])
    assert set(got.values()) == {3}


def test_non_convergence_raises_instead_of_wrong_clusters(spark):
    """Diameter > max_iterations must be an ERROR, not silently-split
    clusters (ADVICE r01)."""
    e = spark.createDataFrame([(i, i + 1) for i in range(8)], "src long, dst long")
    with pytest.raises(ConvergenceError):
        connected_components(e, max_iterations=2).collect()


def test_non_convergence_warns_when_not_strict(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(8)], "src long, dst long")
    with pytest.warns(UserWarning, match="did not converge"):
        labels = connected_components(e, max_iterations=2, strict=False)
    assert labels.count() == 9  # partial labels still returned


def _cc_star(spark, edges, nodes=None, **kw):
    from cloudfloe_spark.operators.graph import connected_components_star

    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long") if nodes else None
    return {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(e, nodes=n, **kw).collect()
    }


def test_star_long_path_converges_in_log_rounds(spark):
    """A 100-node path has diameter 99 — min-label would need ~99 rounds;
    alternating star must finish within ~log2(n) alternations."""
    got = _cc_star(spark, [(i, i + 1) for i in range(100)], max_rounds=10)
    assert set(got.values()) == {0} and len(got) == 101


def test_star_matches_label_propagation_on_random_graphs(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 10 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = list(range(n))
        assert _cc_star(spark, edges, nodes=nodes) == _cc(
            spark, edges, nodes=nodes
        ), trial


def test_star_isolated_nodes_and_cycle(spark):
    got = _cc_star(spark, [(3, 4), (4, 5), (5, 3)], nodes=[3, 4, 5, 9])
    assert got == {3: 3, 4: 3, 5: 3, 9: 9}


def test_star_self_loop_only_node_is_singleton(spark):
    """A node appearing only in self-loop edges must come back as its own
    singleton cluster from BOTH variants, without needing the optional
    nodes universe (the a != b pre-filter must not drop it)."""
    edges = [(1, 2), (7, 7)]
    assert _cc(spark, edges) == {1: 1, 2: 1, 7: 7}
    assert _cc_star(spark, edges) == {1: 1, 2: 1, 7: 7}


def test_star_random_graphs_with_self_loops_match_propagation(spark):
    import random

    rng = random.Random(13)
    for trial in range(2):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(50)
        ]  # self-loops kept on purpose
        assert _cc_star(spark, edges) == _cc(spark, edges), trial


# --- pagerank with dangling-mass correction (VERDICT r05 #4) -------------------


def test_pagerank_conserves_mass_on_dag_with_sinks(spark):
    """A directed chain 1→2→3 has a hard sink (node 3); without the
    dangling redistribution term total rank leaks by ~d·pr(sink) per
    iteration. The corrected operator keeps Σpr = 1 exactly."""
    from cloudfloe_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    pr = pagerank(e, iterations=4)
    total = pr.agg({"pr": "sum"}).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_matches_numpy_reference(spark):
    """Exact per-iteration agreement with the dense stochastic-matrix
    formulation (teleport + dangling uniform redistribution) on a small
    directed graph with two sinks."""
    from cloudfloe_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (4, 1), (4, 5)]  # sinks: 3, 5
    nodes = [1, 2, 3, 4, 5]
    d, iters = 0.85, 3
    out = {1: [2, 3], 2: [3], 4: [1, 5]}
    pr = {n: 1 / 5 for n in nodes}
    for _ in range(iters):
        contrib = {n: 0.0 for n in nodes}
        for u, targets in out.items():
            for v in targets:
                contrib[v] += pr[u] / len(targets)
        dang = sum(pr[n] for n in nodes if n not in out)
        pr = {
            n: (1 - d) / 5 + d * (contrib[n] + dang / 5) for n in nodes
        }
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["pr"]
        for r in pagerank(e, damping=d, iterations=iters).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - pr[n]) < 1e-12, n


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is already stationary at the uniform vector —
    every iteration must return exactly 1/n per node."""
    from cloudfloe_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got = [r["pr"] for r in pagerank(e, iterations=5).collect()]
    assert all(abs(v - 1 / 3) < 1e-12 for v in got)


# --- k-core to fixpoint (VERDICT r05 #5) ---------------------------------------


def test_kcore_peels_cascade_to_fixpoint(spark):
    """A 4-clique with a pendant chain: the chain peels away over
    MULTIPLE rounds (each removal lowers the next node's degree below k),
    which a fixed peel count would miss. History records the cascade."""
    from cloudfloe_spark.operators.graph import kcore

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    chain = [(4, 5), (5, 6), (6, 7)]
    e = spark.createDataFrame(clique + chain, "src long, dst long")
    hist: list = []
    core = kcore(e, 2, history=hist)
    got = {r["node"]: r["degree_in_core"] for r in core.collect()}
    # chain cascade at k=2: 7 peels (degree 1) → 6 drops to degree 1 →
    # 5 drops → clique stable; node 4's chain edge is gone from the core
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert hist == [6, 5, 4, 4]  # the recorded shrink sequence, to fixpoint
    assert hist[-1] == hist[-2] == 4  # fixpoint reached and verified


def test_kcore_empty_core_terminates(spark):
    from cloudfloe_spark.operators.graph import kcore

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    hist: list = []
    assert kcore(e, 5, history=hist).count() == 0
    assert hist[-1] == 0


def test_kcore_nonconvergence_contract(spark):
    """Hitting max_peels while still shrinking must raise, not return a
    superset of the true core."""
    from cloudfloe_spark.operators.graph import ConvergenceError, kcore

    chain = [(i, i + 1) for i in range(10)]
    e = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(ConvergenceError):
        kcore(e, 2, max_peels=2).collect()
