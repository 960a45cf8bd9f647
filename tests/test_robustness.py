"""Algorithm oracles for hub-knockout robustness."""

from __future__ import annotations

from amanogawa_spark.graph.robustness import hub_knockout, top_hubs


def _g(spark, pairs):
    e = spark.createDataFrame(pairs, "src_id long, dst_id long")
    v = (
        e.selectExpr("src_id AS id")
        .union(e.selectExpr("dst_id AS id"))
        .distinct()
    )
    return v, e


def test_star_collapses_without_its_hub(spark):
    # star: 0 -> 1..8; removing the hub isolates everyone
    v, e = _g(spark, [(0, i) for i in range(1, 9)])
    row = hub_knockout(v, e, k=1, fixed_rounds=10).collect()[0]
    assert row["giant_before"] == 9
    assert row["giant_after"] == 1
    assert row["retained_frac"] == round(1 / 9, 8)


def test_cycle_survives_single_removal(spark):
    # ring of 10: removing the (arbitrary) top hub leaves a 9-path
    v, e = _g(spark, [(i, (i + 1) % 10) for i in range(10)])
    row = hub_knockout(v, e, k=1, fixed_rounds=10).collect()[0]
    assert row["giant_before"] == 10
    assert row["giant_after"] == 9


def test_top_hubs_orders_by_degree_then_id(spark):
    _, e = _g(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (4, 0)])
    hubs = top_hubs(e, k=2).collect()
    assert [h["id"] for h in hubs] == [0, 1]  # deg 5; then deg 2 (id 1 < 2)


def test_fixed_rounds_matches_convergence_on_small_graph(spark):
    v, e = _g(spark, [(0, 1), (1, 2), (3, 4), (5, 6), (6, 0)])
    a = hub_knockout(v, e, k=1, fixed_rounds=8).collect()[0]
    b = hub_knockout(v, e, k=1).collect()[0]
    assert a == b
