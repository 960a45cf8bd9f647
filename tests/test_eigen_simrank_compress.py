"""Eigenvector centrality, truncated hitting time, SimRank, adjacency
gap-compression — each checked against an independent pure-python /
numpy mirror on small deterministic graphs, plus repartition
invariance on the one windowed operator."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from amanogawa_spark.graph.compress import adjacency_gap_bits, compression_summary
from amanogawa_spark.graph.eigen import eigenvector_centrality, truncated_hitting_time
from amanogawa_spark.graph.simrank import simrank_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


def _verts(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], ["id"])


GRAPH = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (4, 0),
    (5, 4), (5, 1), (6, 5), (2, 6), (1, 6),
]
N = 7


def _eig_numpy(n, pairs, iters):
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        raw = np.zeros(n)
        for s, d in pairs:
            raw[d] += x[s]
        x = raw / raw.sum()
    return x


def test_eigenvector_matches_numpy(spark):
    res = {
        r["id"]: r["eig"]
        for r in eigenvector_centrality(
            _verts(spark, range(N)), _edges(spark, GRAPH), iterations=5
        ).collect()
    }
    exp = _eig_numpy(N, GRAPH, 5)
    assert set(res) == set(range(N))
    for i in range(N):
        assert res[i] == pytest.approx(exp[i], abs=1e-12)
    assert sum(res.values()) == pytest.approx(1.0)


def test_eigenvector_sink_only_vertex_is_zero(spark):
    # 9 has no in-links: decays to 0 after the first normalization
    e = _edges(spark, [(9, 0), (0, 1), (1, 0)])
    res = {
        r["id"]: r["eig"]
        for r in eigenvector_centrality(
            _verts(spark, [0, 1, 9]), e, iterations=3
        ).collect()
    }
    assert res[9] == 0.0
    assert res[0] > 0 and res[1] > 0


def _hitting_numpy(n, pairs, targets, horizon):
    out = defaultdict(list)
    for s, d in pairs:
        out[s].append(d)
    h = np.zeros(n)
    for k in range(1, horizon + 1):
        nh = np.zeros(n)
        for v in range(n):
            if v in targets:
                nh[v] = 0.0
            elif out[v]:
                nh[v] = 1.0 + np.mean([h[w] for w in out[v]])
            else:
                nh[v] = float(k)
        h = nh
    return h


def test_hitting_time_matches_numpy(spark):
    targets = {0, 4}
    res = {
        r["id"]: r["hitting"]
        for r in truncated_hitting_time(
            _verts(spark, range(N)),
            _edges(spark, GRAPH),
            _verts(spark, targets),
            horizon=4,
        ).collect()
    }
    exp = _hitting_numpy(N, GRAPH, targets, 4)
    for i in range(N):
        assert res[i] == pytest.approx(exp[i], abs=1e-12)


def test_hitting_time_caps_unreachable_and_dangling(spark):
    # 2 is dangling and not a target; 3 only reaches the dangling 2
    e = _edges(spark, [(0, 1), (3, 2)])
    res = {
        r["id"]: r["hitting"]
        for r in truncated_hitting_time(
            _verts(spark, [0, 1, 2, 3]), e, _verts(spark, [1]), horizon=5
        ).collect()
    }
    assert res[1] == 0.0
    assert res[0] == 1.0
    assert res[2] == 5.0  # dangling non-target sits at the cap
    # 3's only successor is capped-at-(k-1) dangling 2: 1 + h(2)
    assert res[3] == 1.0 + 4.0


def _simrank_numpy(n, pairs, iters, c):
    """Restricted-support SimRank mirror: dense matrices, but off-support
    entries forced to 0 after every iteration (the engine's contract)."""
    ins = defaultdict(set)
    for s, d in pairs:
        if s != d:
            ins[d].add(s)
    support = set()
    for a in range(n):
        for b in range(a + 1, n):
            if ins[a] & ins[b]:
                support.add((a, b))
    s_mat = np.eye(n)
    for _ in range(iters):
        nxt = np.eye(n)
        for a, b in support:
            tot = 0.0
            for i in ins[a]:
                for j in ins[b]:
                    tot += s_mat[min(i, j), max(i, j)]
            nxt[a, b] = c * tot / (len(ins[a]) * len(ins[b]))
        # zero everything off-support (including what full SimRank
        # would have filled in)
        masked = np.eye(n)
        for a, b in support:
            masked[a, b] = nxt[a, b]
        s_mat = masked
    return {(a, b): s_mat[a, b] for a, b in support}


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_simrank_matches_restricted_numpy(spark, iters):
    res = {
        (r["a"], r["b"]): r["score"]
        for r in simrank_pairs(_edges(spark, GRAPH), iterations=iters, c=0.8).collect()
    }
    exp = _simrank_numpy(N, GRAPH, iters, 0.8)
    assert set(res) == set(exp)
    for k in exp:
        assert res[k] == pytest.approx(exp[k], abs=1e-12), k


def test_simrank_in_degree_cap_drops_hub(spark):
    # vertex 9 cited by everyone: with the cap it pairs with nothing
    pairs = [(i, 9) for i in range(5)] + [(0, 1), (2, 1)]
    res = simrank_pairs(
        _edges(spark, pairs), iterations=1, max_in_degree=3
    ).collect()
    assert all(r["a"] != 9 and r["b"] != 9 for r in res)
    # (1 shares in-neighbor sets only with 9, which was dropped)
    assert res == []


def _gamma(g):
    return 2 * int(math.floor(math.log2(g))) + 1


def test_gap_bits_hand(spark):
    e = _edges(spark, [(1, 3), (1, 4), (1, 12), (2, 100), (1, 3), (5, 5)])
    rows = {r["src_id"]: r for r in adjacency_gap_bits(e).collect()}
    # src 1: sorted dsts 3,4,12 → gaps 4 (3+1), 1, 8
    exp1 = _gamma(4) + _gamma(1) + _gamma(8)
    assert rows[1]["n_links"] == 3
    assert rows[1]["gamma_bits"] == exp1
    assert rows[1]["raw_bits"] == 192
    assert rows[1]["bits_per_link"] == pytest.approx(round(exp1 / 3, 6), abs=1e-9)
    # src 2: single dst 100 → gap 101
    assert rows[2]["gamma_bits"] == _gamma(101)
    assert 5 not in rows  # self-loop dropped


def test_compression_summary_aggregates(spark):
    e = _edges(spark, [(1, 3), (1, 4), (2, 7)])
    row = compression_summary(e).collect()[0]
    exp = _gamma(4) + _gamma(1) + _gamma(8)
    assert row["n_sources"] == 2
    assert row["n_links"] == 3
    assert row["gamma_bits"] == exp
    assert row["raw_bits"] == 192
    assert row["compression_ratio"] == pytest.approx(round(exp / 192, 6))


def test_gap_bits_repartition_invariant(spark):
    pairs = [(i % 17, (i * 7 + 3) % 101) for i in range(400)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, adjacency_gap_bits(e).collect()))
    b = sorted(map(tuple, adjacency_gap_bits(e.repartition(13)).collect()))
    assert a == b
