"""SALSA (graph/salsa.py): degree-proportional fixed point + TKC sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.salsa import salsa, salsa_fixed_iterations


def _g(spark, pairs):
    ids = sorted({x for p in pairs for x in p})
    return (
        spark.createDataFrame([(i,) for i in ids], "id long"),
        spark.createDataFrame(pairs, "src_id long, dst_id long"),
    )


def test_degree_proportional_fixed_point(spark):
    # strongly-connected-support digraph: authority fixpoint = indeg/|E|,
    # hub fixpoint = outdeg/|E| (exact stationary distribution of the chain)
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 0), (2, 1)]
    v, e = _g(spark, pairs)
    res = salsa(v, e, tol=1e-10, max_iter=40)
    m = len(pairs)
    indeg = {0: 2, 1: 2, 2: 2}
    outdeg = {0: 2, 1: 2, 2: 2}
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    for i in got:
        assert got[i][0] == pytest.approx(outdeg[i] / m, abs=1e-9)
        assert got[i][1] == pytest.approx(indeg[i] / m, abs=1e-9)
    assert res.delta <= 1e-10


def test_asymmetric_degrees_converge_to_degree_ratio(spark):
    # authority mass follows in-degree on a connected support, regardless
    # of the tight link structure that would capture HITS
    pairs = [(0, 3), (1, 3), (2, 3), (0, 4), (3, 0), (4, 1)]
    v, e = _g(spark, pairs)
    res = salsa(v, e, tol=1e-6, max_iter=20)
    got = {r["id"]: r["authority"] for r in res.scores.collect()}
    # vertex 3 has indeg 3 of 6 edges; its support-component share should
    # dominate every other authority
    assert got[3] == max(got.values())


def test_fixed_iterations_deterministic(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2)]
    v, e = _g(spark, pairs)
    a = sorted(map(tuple, salsa_fixed_iterations(v, e, 3).collect()))
    b = sorted(
        map(tuple, salsa_fixed_iterations(v, e.repartition(5), 3).collect())
    )
    assert a == pytest.approx(b)


def test_l1_normalized_each_iteration(spark):
    pairs = [(0, 1), (2, 1), (1, 0), (5, 6)]
    v, e = _g(spark, pairs)
    s = salsa_fixed_iterations(v, e, 2)
    sums = s.agg(F.sum("hub"), F.sum("authority")).collect()[0]
    assert sums[0] == pytest.approx(1.0, abs=1e-9)
    assert sums[1] == pytest.approx(1.0, abs=1e-9)
