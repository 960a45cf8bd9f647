"""Directed triad census (graph/triads.py) vs brute-force enumeration."""

from __future__ import annotations

import random
from itertools import combinations

from amanogawa_spark.graph.triads import (
    TRIAD_NAMES,
    classify_triad,
    triad_census,
)


def _brute_census(n: int, edges: list[tuple[int, int]]) -> dict[str, int]:
    es = set(edges)
    counts = {t: 0 for t in TRIAD_NAMES}
    for a, b, c in combinations(range(n), 3):
        trip = [a, b, c]
        local = set()
        for i, u in enumerate(trip):
            for j, v in enumerate(trip):
                if i != j and (u, v) in es:
                    local.add((i, j))
        counts[classify_triad(local)] += 1
    return counts


def _random_digraph(seed: int, n: int, p: float) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < p
    ]


def _run(spark, n, edges):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    if edges:
        e = spark.createDataFrame(edges, "src_id long, dst_id long")
    else:
        e = spark.createDataFrame([], "src_id long, dst_id long")
    return {r["triad_type"]: r["count"] for r in triad_census(v, e).collect()}


def test_census_matches_bruteforce_random(spark):
    for seed, n, p in [(1, 10, 0.15), (2, 12, 0.3), (3, 9, 0.55)]:
        edges = _random_digraph(seed, n, p)
        got = _run(spark, n, edges)
        want = _brute_census(n, edges)
        assert got == want, (seed, got, want)
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_census_handles_mutual_heavy_and_empty(spark):
    # all-mutual triangle + isolated vertices: one 300, rest 102/003
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    got = _run(spark, 6, edges)
    assert got == _brute_census(6, edges)
    assert got["300"] == 1
    # empty graph: everything is 003
    got0 = _run(spark, 5, [])
    assert got0["003"] == 10
    assert sum(got0.values()) == 10


def test_census_ignores_self_loops_and_parallel(spark):
    edges = [(0, 1), (0, 1), (1, 1), (2, 0), (0, 2), (2, 3)]
    clean = [(0, 1), (2, 0), (0, 2), (2, 3)]
    got = _run(spark, 5, edges)
    assert got == _brute_census(5, clean)
