"""connected_components vs a python union-find oracle (property + edges)."""

from __future__ import annotations

import random

import pytest

from convex_batch_processor_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node in component
    comp: dict[int, int] = {}
    for n in parent:
        root = find(n)
        comp.setdefault(root, root)
    return {n: find(n) for n in parent}


def _spark_cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, **kw).collect()
    return {r.node: r.component_id for r in rows}


def test_chain_and_islands(spark):
    # one 5-chain (diameter 4), one triangle, one isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _spark_cc(spark, edges)
    assert got == _union_find(edges)
    assert got[5] == 1 and got[12] == 10 and got[21] == 20


def test_duplicate_and_self_edges_harmless(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)]
    got = _spark_cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
    assert _spark_cc(spark, edges) == _union_find(edges)


def test_nonconvergence_raises(spark):
    # a 6-chain cannot converge in 2 rounds of one-hop min propagation
    edges = [(i, i + 1) for i in range(1, 6)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _spark_cc(spark, edges, max_iter=2)


def _spark_star(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components_star(df, **kw).collect()
    return {r.node: r.component_id for r in rows}


def test_star_matches_union_find_on_random_graph(spark):
    rng = random.Random(11)
    nodes = list(range(80))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
    assert _spark_star(spark, edges) == _union_find(edges)


def test_star_long_chain_converges_in_log_rounds(spark):
    # a 200-node chain: min propagation needs ~199 rounds; star needs ~log2
    edges = [(i, i + 1) for i in range(200)]
    got = _spark_star(spark, edges, max_iter=12)
    assert got == {n: 0 for n in range(201)}


def test_star_self_edges_and_isolated_nodes(spark):
    # self-edge-only node keeps its own label; duplicates are harmless
    edges = [(5, 5), (1, 2), (2, 1), (2, 3)]
    assert _spark_star(spark, edges) == {1: 1, 2: 1, 3: 1, 5: 5}


def test_connected_components_string_and_hashrange_ids(spark):
    """Review r6 (confirmed crash): the old sum('comp') fixpoint
    checksum threw ANSI CAST_INVALID_INPUT on string node ids and long
    overflow on hash-range ids (and falsely converged with ANSI off);
    the changed-label count is exact for any orderable id type."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    got = {
        r.node: r.component_id
        for r in connected_components(edges).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}

    big = 2**62  # xxhash64-range ids: sum over a few overflows long
    edges2 = spark.createDataFrame(
        [(big, big + 1), (big + 1, big + 2), (big + 5, big + 6)],
        "src long, dst long",
    )
    got2 = {
        r.node: r.component_id for r in connected_components(edges2).collect()
    }
    assert got2 == {
        big: big, big + 1: big, big + 2: big, big + 5: big + 5, big + 6: big + 5,
    }
