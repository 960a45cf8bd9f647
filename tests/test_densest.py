"""Densest subgraph (batched greedy peel) — planted-farm recovery +
brute-force approximation bound."""

from __future__ import annotations

import itertools

from amanogawa_spark.graph.densest import densest_subgraph, peel_profile_df


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id long, dst_id long")


def test_recovers_planted_clique(spark):
    # sparse 40-vertex ring + a 6-clique on 100..105
    ring = [(i, (i + 1) % 40) for i in range(40)]
    clique = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    sub, stats = densest_subgraph(_edges(spark, ring + clique), eps=0.5)
    ids = sorted(r["id"] for r in sub.collect())
    assert ids == [100, 101, 102, 103, 104, 105]
    assert stats["density"] == 15 / 6  # (6*5/2) / 6
    sub.unpersist()


def test_approximation_bound_vs_brute_force(spark):
    # 10-vertex deterministic graph: check density >= opt / (2*(1+eps))
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(10), 2)
        if (a * 7 + b * 13) % 3 == 0
    ]
    eset = {frozenset(p) for p in pairs}

    def density(vs):
        e = sum(1 for p in eset if p <= vs)
        return e / len(vs)

    opt = max(
        density(set(c))
        for k in range(1, 11)
        for c in itertools.combinations(range(10), k)
    )
    sub, stats = densest_subgraph(_edges(spark, pairs), eps=0.5)
    got = {r["id"] for r in sub.collect()}
    sub.unpersist()
    assert stats["density"] == density(got)
    assert stats["density"] >= opt / (2 * 1.5) - 1e-12


def test_profile_monotone_shrink_and_fixed_rounds_idle_tail(spark):
    ring = [(i, (i + 1) % 30) for i in range(30)]
    clique = [(50 + i, 50 + j) for i in range(5) for j in range(i + 1, 5)]
    prof = peel_profile_df(_edges(spark, ring + clique), eps=0.5, fixed_rounds=10)
    rows = prof.orderBy("round").collect()
    # vertex counts strictly shrink; trailing empty rounds are dropped
    nvs = [r["n_vertices"] for r in rows]
    assert nvs == sorted(nvs, reverse=True) and len(set(nvs)) == len(nvs)
    assert all(r["n_vertices"] > 0 for r in rows)
    assert len(rows) < 10  # the ring dies fast; no padded idle rows


def test_repartition_invariance(spark):
    pairs = [(i % 17, (i * 5 + 2) % 17) for i in range(60) if i % 17 != (i * 5 + 2) % 17]
    a, sa = densest_subgraph(_edges(spark, pairs), eps=0.5)
    b, sb = densest_subgraph(_edges(spark, pairs).repartition(7), eps=0.5)
    assert sorted(r["id"] for r in a.collect()) == sorted(r["id"] for r in b.collect())
    assert sa == sb
    a.unpersist(), b.unpersist()


def test_empty_graph(spark):
    sub, stats = densest_subgraph(_edges(spark, []), eps=0.5)
    assert sub.count() == 0 and stats["rounds_run"] == 0
