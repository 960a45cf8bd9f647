"""Jones–Plassmann coloring (graph/coloring.py)."""

from __future__ import annotations

import pytest

from amanogawa_spark.graph.coloring import jp_coloring


def _g(spark, pairs):
    return (
        spark.createDataFrame([(i,) for i in sorted({x for p in pairs for x in p})], "id long"),
        spark.createDataFrame(pairs, "src_id long, dst_id long"),
    )


def _check_proper(colors: dict[int, int], pairs):
    for a, b in pairs:
        if a != b:
            assert colors[a] != colors[b], (a, b)


def test_coloring_proper_on_cycle_and_bounded(spark):
    pairs = [(i, (i + 1) % 7) for i in range(7)]  # odd cycle: needs 3 colors
    v, e = _g(spark, pairs)
    out = jp_coloring(v, e)
    colors = {r["id"]: r["color"] for r in out.collect()}
    assert len(colors) == 7
    _check_proper(colors, pairs)
    assert max(colors.values()) <= 2  # Δ=2 → at most Δ+1 = 3 colors (0..2)


def test_coloring_complete_graph_uses_n_colors(spark):
    n = 5
    pairs = [(a, b) for a in range(n) for b in range(n) if a < b]
    v, e = _g(spark, pairs)
    colors = {r["id"]: r["color"] for r in jp_coloring(v, e).collect()}
    _check_proper(colors, pairs)
    assert sorted(colors.values()) == list(range(n))  # K5 forces 5 distinct


def test_coloring_isolated_and_deterministic(spark):
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    e = spark.createDataFrame([(0, 1), (2, 3)], "src_id long, dst_id long")
    a = sorted(map(tuple, jp_coloring(v, e).collect()))
    b = sorted(map(tuple, jp_coloring(v, e.repartition(5)).collect()))
    assert a == b
    colors = {r[0]: r[1] for r in a}
    assert colors[4] == 0 and colors[5] == 0  # isolated verts take color 0
    assert colors[0] != colors[1] and colors[2] != colors[3]


def test_coloring_star_two_colors(spark):
    pairs = [(0, i) for i in range(1, 9)]
    v, e = _g(spark, pairs)
    colors = {r["id"]: r["color"] for r in jp_coloring(v, e).collect()}
    _check_proper(colors, pairs)
    assert len(set(colors.values())) == 2  # star is bipartite


def test_coloring_max_rounds_raises(spark):
    pairs = [(a, b) for a in range(6) for b in range(6) if a < b]  # K6: 6 rounds
    v, e = _g(spark, pairs)
    with pytest.raises(RuntimeError, match="uncolored"):
        jp_coloring(v, e, max_rounds=2)
