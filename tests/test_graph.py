"""Connected components (operators/graph.py) vs a Python union-find
ground truth on adversarial shapes — long chains (pointer-jump
convergence), cycles, stars, isolated vertices."""

from __future__ import annotations

from sparkclif.operators.graph import connected_components


def _union_find(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member per component
    comp = {}
    for v in range(n_vertices):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(members) for r, members in comp.items() for v in members}


def _check(spark, n, edges, max_iter=50):
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        edf = edf.limit(0)
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, vertices=vdf, max_iter=max_iter).collect()
    }
    want = _union_find(n, edges)
    assert got == want


def test_long_chain_converges_in_log_rounds(spark):
    """A 64-vertex chain must finish within ~log2(64)+slack rounds —
    pointer jumping, not one-hop propagation."""
    edges = [(i, i + 1) for i in range(63)]
    _check(spark, 64, edges, max_iter=10)


def test_cycle_and_star(spark):
    edges = [(0, 1), (1, 2), (2, 0), (5, 6), (5, 7), (5, 8)]
    _check(spark, 10, edges)


def test_isolated_vertices_are_singletons(spark):
    _check(spark, 6, [(1, 4)])


def test_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 2)]
    _check(spark, 5, edges)


def test_unconverged_exit_raises(spark):
    """Round-4 fix (ADVICE r3): exhausting max_iter without the
    changed==0 break must raise, not silently return over-split
    labels (a 16-chain cannot settle in 1 round)."""
    import pytest

    edges = [(i, i + 1) for i in range(15)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edf, max_iter=1)


def test_returned_labels_are_lineage_truncated(spark):
    """Optimization r12 pins the round structure to ONE action (the
    convergence count materializes the lazy localCheckpoint). The
    contract that must survive: the returned labels are a checkpointed
    relation (scan of an existing RDD), not a live lineage over the
    full iteration history — a silent regression here would make every
    downstream consumer re-run all rounds per action."""
    edges = [(i, i + 1) for i in range(31)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    labels = connected_components(edf, max_iter=10)
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    # and it is already materialized: consuming it twice returns
    # identical rows without recomputation divergence
    assert labels.count() == 32
