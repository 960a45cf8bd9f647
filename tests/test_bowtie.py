"""Bowtie decomposition (graph/bowtie.py): hand-built Broder graphs with
known region assignments, frontier-BFS reachability, and partition
invariance."""

from __future__ import annotations

import pytest

from amanogawa_spark.graph.bowtie import (
    _reachable_from,
    bowtie_decomposition,
    bowtie_summary,
    giant_scc,
)

# the textbook bowtie: 3-cycle core, IN chain, OUT chain, a tube, both
# tendril kinds, and a disconnected island
_EDGES = [
    (1, 2), (2, 3), (3, 1),          # CORE
    (10, 1), (11, 10),               # IN
    (3, 20), (20, 21),               # OUT
    (10, 30), (30, 20),              # TUBE via 30
    (10, 40),                        # TENDRIL_IN leaf
    (50, 20),                        # TENDRIL_OUT feeder
    (60, 61),                        # DISCONNECTED
]
_EXPECTED = {
    1: "CORE", 2: "CORE", 3: "CORE",
    10: "IN", 11: "IN",
    20: "OUT", 21: "OUT",
    30: "TUBE",
    40: "TENDRIL_IN",
    50: "TENDRIL_OUT",
    60: "DISCONNECTED", 61: "DISCONNECTED",
}


def _graph(spark, pairs):
    e = spark.createDataFrame(pairs, ["src_id", "dst_id"])
    v = (
        e.selectExpr("src_id AS id")
        .union(e.selectExpr("dst_id AS id"))
        .distinct()
    )
    return v, e


def test_bowtie_hand_graph(spark):
    v, e = _graph(spark, _EDGES)
    got = {r["id"]: r["region"] for r in bowtie_decomposition(v, e).collect()}
    assert got == _EXPECTED


def test_bowtie_repartition_invariance(spark):
    v, e = _graph(spark, _EDGES)
    base = {r["id"]: r["region"] for r in bowtie_decomposition(v, e).collect()}
    shuffled = {
        r["id"]: r["region"]
        for r in bowtie_decomposition(v.repartition(7), e.repartition(5)).collect()
    }
    assert base == shuffled


def test_bowtie_summary_fractions(spark):
    v, e = _graph(spark, _EDGES)
    rows = bowtie_summary(bowtie_decomposition(v, e)).collect()
    by_region = {r["region"]: r for r in rows}
    assert by_region["CORE"]["n_vertices"] == 3
    assert sum(r["n_vertices"] for r in rows) == len(_EXPECTED)
    assert sum(r["frac"] for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_giant_scc_tiebreak_min_label(spark):
    # two SCCs of equal size 2 → the smaller min-label wins
    v, e = _graph(spark, [(1, 2), (2, 1), (5, 6), (6, 5)])
    from amanogawa_spark.graph.scc import strongly_connected_components

    scc = strongly_connected_components(v, e)
    assert giant_scc(scc) == 1


def test_reachable_from_frontier_bfs(spark):
    v, e = _graph(spark, [(1, 2), (2, 3), (4, 5)])
    seeds = spark.createDataFrame([(1,)], ["id"])
    got = {r["id"] for r in _reachable_from(seeds, e).collect()}
    assert got == {1, 2, 3}
    # backward: who reaches 3?
    back = {
        r["id"]
        for r in _reachable_from(
            spark.createDataFrame([(3,)], ["id"]), e, src="dst_id", dst="src_id"
        ).collect()
    }
    assert back == {1, 2, 3}


def test_bowtie_all_core(spark):
    # a single big cycle: everything is CORE
    n = 6
    v, e = _graph(spark, [(i, (i + 1) % n) for i in range(n)])
    regions = {r["region"] for r in bowtie_decomposition(v, e).collect()}
    assert regions == {"CORE"}
