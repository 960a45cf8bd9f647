"""Sampled-Brandes betweenness vs a textbook single-machine mirror."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.centrality import betweenness_sampled


def _brandes(adj: dict[int, set[int]], sources) -> dict[int, float]:
    """Textbook Brandes accumulation over ORDERED (s, t) pairs."""
    bc: dict[int, float] = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        preds: dict[int, list[int]] = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
                    preds[w].append(v)
        delta: dict[int, float] = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def _ring_chords(spark, n=40):
    pairs = [(i, (i + 1) % n) for i in range(n)] + [
        (i, (i + 9) % n) for i in range(0, n, 4)
    ]
    e = spark.createDataFrame(pairs, "src_id long, dst_id long")
    v = e.select(F.col("src_id").alias("id")).union(e.select("dst_id")).distinct()
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    return v, e, adj


def test_betweenness_all_sources_matches_brandes(spark):
    v, e, adj = _ring_chords(spark)
    ids = sorted(adj)
    got = {
        r.id: r.betweenness
        for r in betweenness_sampled(v, e, sources=ids, max_depth=50).collect()
    }
    want = _brandes(adj, ids)
    assert set(got) == set(adj)
    for i in ids:
        assert got[i] == pytest.approx(want.get(i, 0.0), abs=1e-9), f"vertex {i}"


def test_betweenness_path_graph(spark):
    # path 0-1-2-3-4: ordered-pair dependency sums = 2x unordered betweenness
    pairs = [(i, i + 1) for i in range(4)]
    e = spark.createDataFrame(pairs, "src_id long, dst_id long")
    v = e.select(F.col("src_id").alias("id")).union(e.select("dst_id")).distinct()
    got = {
        r.id: r.betweenness
        for r in betweenness_sampled(v, e, sources=[0, 1, 2, 3, 4]).collect()
    }
    assert got == {0: 0.0, 1: 6.0, 2: 8.0, 3: 6.0, 4: 0.0}


def test_betweenness_directed_and_sampled(spark):
    v, e, _ = _ring_chords(spark)
    # directed mirror: adjacency is only the forward arcs
    fwd = defaultdict(set)
    for r in e.collect():
        if r.src_id != r.dst_id:
            fwd[r.src_id].add(r.dst_id)
    srcs = [0, 4, 11]
    got = {
        r.id: r.betweenness
        for r in betweenness_sampled(
            v, e, sources=srcs, symmetrize=False, max_depth=50
        ).collect()
    }
    want = _brandes(fwd, srcs)
    for i in got:
        assert got[i] == pytest.approx(want.get(i, 0.0), abs=1e-9), f"vertex {i}"


def test_betweenness_scale_factor(spark):
    v, e, adj = _ring_chords(spark)
    raw = {
        r.id: r.betweenness
        for r in betweenness_sampled(v, e, sources=[0, 1]).collect()
    }
    scaled = {
        r.id: r.betweenness
        for r in betweenness_sampled(v, e, sources=[0, 1], scale=True).collect()
    }
    n = len(adj)
    for i in raw:
        assert scaled[i] == pytest.approx(raw[i] * n / 2 / 2.0, rel=1e-12)
