"""Shortest paths: exact match vs a pure-Python Bellman-Ford mirror."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.sssp import bfs_levels, shortest_paths


def _py_sssp(edges, sources, rounds=10**9):
    """Synchronous Bellman-Ford: dict[(source, v)] = dist after ≤rounds."""
    dist = {(s, s): 0.0 for s in sources}
    for _ in range(rounds):
        cand = {}
        for (s, u), d in dist.items():
            for v, w in edges.get(u, []):
                key = (s, v)
                nd = d + w
                if nd < cand.get(key, float("inf")):
                    cand[key] = nd
        changed = False
        for key, nd in cand.items():
            if nd < dist.get(key, float("inf")):
                dist[key] = nd
                changed = True
        if not changed:
            break
    return dist


@pytest.fixture(scope="module")
def wgraph():
    rng = random.Random(11)
    adj: dict[int, list[tuple[int, float]]] = {}
    rows = []
    seen = set()
    for _ in range(400):
        u, v = rng.randrange(60), rng.randrange(60)
        if u == v or (u, v) in seen:
            continue
        seen.add((u, v))
        w = float(rng.randrange(1, 9))
        adj.setdefault(u, []).append((v, w))
        rows.append((u, v, w))
    return adj, rows


def test_weighted_converged_matches_python(spark, wgraph):
    adj, rows = wgraph
    e = spark.createDataFrame(rows, "src_id long, dst_id long, w double")
    got = {
        (r["source"], r["id"]): r["dist"]
        for r in shortest_paths(e, sources=[0, 1, 2], weight="w").collect()
    }
    assert got == _py_sssp(adj, [0, 1, 2])


def test_bounded_rounds_equal_le_k_edge_paths(spark, wgraph):
    adj, rows = wgraph
    e = spark.createDataFrame(rows, "src_id long, dst_id long, w double")
    got = {
        (r["source"], r["id"]): r["dist"]
        for r in shortest_paths(e, sources=[5], weight="w", max_rounds=2).collect()
    }
    assert got == _py_sssp(adj, [5], rounds=2)


def test_bfs_levels_unweighted(spark, wgraph):
    adj, rows = wgraph
    e = spark.createDataFrame(rows, "src_id long, dst_id long, w double")
    hop_adj = {u: [(v, 1.0) for v, _ in nbrs] for u, nbrs in adj.items()}
    got = {
        (r["source"], r["id"]): float(r["dist"])
        for r in bfs_levels(e, sources=[0, 7]).collect()
    }
    assert got == _py_sssp(hop_adj, [0, 7])


def test_parallel_edges_keep_cheapest_and_repartition_invariant(spark):
    rows = [(0, 1, 5.0), (0, 1, 2.0), (1, 2, 1.0), (0, 2, 9.0)]
    e = spark.createDataFrame(rows, "src_id long, dst_id long, w double")
    expect = {(0, 0): 0.0, (0, 1): 2.0, (0, 2): 3.0}
    for k in (1, 7):
        got = {
            (r["source"], r["id"]): r["dist"]
            for r in shortest_paths(e.repartition(k), [0], weight="w").collect()
        }
        assert got == expect
