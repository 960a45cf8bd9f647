"""Borůvka minimum spanning forest (graph/mst.py) vs driver Kruskal."""

from __future__ import annotations

import random

from amanogawa_spark.graph.mst import (
    minimum_spanning_forest,
    single_linkage_clusters,
)


def _kruskal(n: int, edges: list[tuple[int, int, float]]) -> set[tuple[int, int, float]]:
    """Union-find Kruskal under the same strict order (w, a, b)."""
    canon: dict[tuple[int, int], float] = {}
    for u, v, w in edges:
        if u == v:
            continue
        k = (min(u, v), max(u, v))
        canon[k] = min(canon.get(k, float("inf")), w)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _random_weighted(seed: int, n: int, p: float, dup_weights: bool = False):
    rng = random.Random(seed)
    edges = []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                w = float(rng.randrange(5)) if dup_weights else rng.random()
                edges.append((u, v, w))
    return edges


def _run_msf(spark, n, edges, **kw):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src_id long, dst_id long, weight double")
    rows = minimum_spanning_forest(v, e, **kw).collect()
    return {(r["a"], r["b"], r["weight"]) for r in rows}


def test_msf_matches_kruskal_distinct_weights(spark):
    edges = _random_weighted(seed=3, n=30, p=0.2)
    assert _run_msf(spark, 30, edges) == _kruskal(30, edges)


def test_msf_matches_kruskal_duplicate_weights_and_forest(spark):
    # two disconnected blobs + heavy weight ties: the strict (w, a, b)
    # order must still give a unique forest identical to Kruskal's
    edges = _random_weighted(seed=7, n=16, p=0.35, dup_weights=True)
    edges += [(16 + u, 16 + v, 1.0) for u, v, _ in _random_weighted(9, 8, 0.5)]
    got = _run_msf(spark, 24, edges)
    want = _kruskal(24, edges)
    assert got == want
    # forest: |V| - #components edges
    comp_cnt = 24 - len(want)
    assert len(got) == 24 - comp_cnt


def test_msf_repartition_invariant(spark):
    edges = _random_weighted(seed=11, n=20, p=0.25)
    v = spark.createDataFrame([(i,) for i in range(20)], "id long")
    e = spark.createDataFrame(edges, "src_id long, dst_id long, weight double")
    a = {
        (r["a"], r["b"], r["weight"])
        for r in minimum_spanning_forest(v.repartition(7), e.repartition(5)).collect()
    }
    assert a == _kruskal(20, edges)


def test_single_linkage_equals_threshold_components(spark):
    edges = _random_weighted(seed=13, n=25, p=0.3)
    v = spark.createDataFrame([(i,) for i in range(25)], "id long")
    e = spark.createDataFrame(edges, "src_id long, dst_id long, weight double")
    forest = minimum_spanning_forest(v, e).persist()
    for t in (0.1, 0.35, 0.7):
        via_forest = {
            (r["id"], r["cluster"])
            for r in single_linkage_clusters(v, forest, t).collect()
        }
        # ground truth: CC over the t-filtered RAW pair graph
        from amanogawa_spark.graph.components import connected_components

        kept = e.filter(e.weight <= t)
        truth = {
            (r["id"], r["component"])
            for r in connected_components(v, kept).collect()
        }
        assert via_forest == truth, t
    forest.unpersist()


def test_msf_fixed_rounds_is_partial_but_consistent(spark):
    # path graph needs several rounds; 1 fixed round must return a
    # subset of the true forest (every Borůvka pick is MST-safe)
    edges = [(i, i + 1, float(i + 1)) for i in range(11)]
    got = _run_msf(spark, 12, edges, fixed_rounds=1, contract_fixed_rounds=3)
    want = _kruskal(12, edges)
    assert got <= want
    assert len(got) >= 6  # every component picks an edge in round one
