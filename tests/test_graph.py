"""Connected components (operators/graph.py) vs a Python union-find.

The oracle-parity path (dedup_components vs the recursive-CTE oracle)
covers the composed pipeline; these tests pin the operator itself on
adversarial graph shapes a dedup corpus can produce:

  * random sparse graphs (the generic case, union-find cross-check);
  * a long path (diameter ≈ n — the shape that breaks label
    propagation; star contraction must converge in O(log n) rounds);
  * mass-duplicate cliques (the hot-cluster shape);
  * empty edge list.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nlp_with_pyspark_spark.operators.graph import connected_components, duplicate_clusters


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to component minimum
    return {x: find(x) for x in parent}


def _spark_assignment(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in out}


# driver_threshold=0 forces the distributed star-contraction path; the
# default exercises the adaptive driver-side union-find fast path — both
# must agree with the independent union-find on every graph
@pytest.mark.parametrize("thr", [0, 100_000])
@pytest.mark.parametrize("seed", [7, 11, 13])
def test_random_graph_matches_union_find(spark, seed, thr):
    rng = random.Random(seed)
    n_nodes, n_edges = 120, 150
    pairs = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    expected = _union_find(pairs)
    got = _spark_assignment(spark, pairs, driver_threshold=thr)
    assert got == expected


def test_path_graph_converges_logarithmically(spark):
    # A 64-node path has diameter 63: label propagation would need ~63
    # rounds; star contraction must finish well inside max_iter=10.
    pairs = [(i, i + 1) for i in range(63)]
    got = _spark_assignment(spark, pairs, max_iter=10, driver_threshold=0)
    assert got == {i: 0 for i in range(64)}


def test_clique_and_isolated_pair(spark):
    clique = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    pairs = clique + [(100, 101)]
    expected = {i: 10 for i in range(10, 15)} | {100: 100, 101: 100}
    assert _spark_assignment(spark, pairs) == expected
    assert _spark_assignment(spark, pairs, driver_threshold=0) == expected


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
    assert connected_components(df, driver_threshold=0).count() == 0


def test_duplicate_clusters_sizes(spark):
    pairs = [(1, 2), (2, 3), (7, 9)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    for thr in (0, 100_000):
        rows = {r["doc_id"]: r for r in duplicate_clusters(df, driver_threshold=thr).collect()}
        assert {d: r["component_id"] for d, r in rows.items()} == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
        assert {d: r["n_members"] for d, r in rows.items()} == {1: 3, 2: 3, 3: 3, 7: 2, 9: 2}
    rows = {r["doc_id"]: r for r in duplicate_clusters(df).collect()}
    assert {d: r["component_id"] for d, r in rows.items()} == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    assert {d: r["n_members"] for d, r in rows.items()} == {1: 3, 2: 3, 3: 3, 7: 2, 9: 2}
