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
