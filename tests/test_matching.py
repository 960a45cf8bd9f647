"""Maximal matching + contraction (graph/matching.py)."""

from __future__ import annotations

from amanogawa_spark.graph.matching import contract_matching, maximal_matching


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "src_id long, dst_id long")


PATH8 = [(i, i + 1) for i in range(7)]  # path 0-1-...-7


def test_matching_valid_and_maximal(spark):
    e = _e(spark, PATH8)
    m = [(r["u"], r["v"]) for r in maximal_matching(e).collect()]
    used = [x for p in m for x in p]
    assert len(used) == len(set(used))  # no vertex matched twice
    # maximality: every edge has a matched endpoint
    matched = set(used)
    for a, b in PATH8:
        assert a in matched or b in matched, (a, b)
    assert len(m) >= 2  # a path of 8 vertices has matching >= 2 (maximal), <= 4


def test_matching_deterministic_and_star(spark):
    star = [(0, i) for i in range(1, 9)]
    e = _e(spark, star)
    m1 = sorted(map(tuple, maximal_matching(e).collect()))
    m2 = sorted(map(tuple, maximal_matching(e.repartition(5)).collect()))
    assert m1 == m2
    assert len(m1) == 1  # star: any maximal matching has exactly one edge


def test_contract_matching_counts_and_weights(spark):
    # square 0-1-2-3-0 with a diagonal 0-2
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    e = _e(spark, pairs)
    m = spark.createDataFrame([(0, 1), (2, 3)], "u long, v long")
    coarse = {(r["src_id"], r["dst_id"]): r["weight"]
              for r in contract_matching(e, m).collect()}
    # vertices {0,1} -> 0, {2,3} -> 2; edges (1,2),(3,0),(0,2) become 0<->2
    assert set(coarse) <= {(0, 2), (2, 0)}
    assert sum(coarse.values()) == 3  # intra-pair edges dropped, weights conserved


def test_empty_graph_matching(spark):
    e = _e(spark, [])
    assert maximal_matching(e).count() == 0
