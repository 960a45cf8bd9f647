"""Rank correlation (graph/rankcorr.py): Spearman extremes, hand value,
intersection semantics, top-k overlap, and the no-global-window plan."""

from __future__ import annotations

import pytest

from amanogawa_spark.graph.rankcorr import rank_positions, spearman_rho, top_k_overlap


def _scores(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in vals], "id long, score double"
    )


def test_rho_identical_is_one(spark):
    a = _scores(spark, [(i, i) for i in range(12)])
    row = spearman_rho(a, a).collect()[0]
    assert row["n_common"] == 12 and row["rho"] == pytest.approx(1.0)


def test_rho_reversed_is_minus_one(spark):
    a = _scores(spark, [(i, i) for i in range(12)])
    b = _scores(spark, [(i, -i) for i in range(12)])
    assert spearman_rho(a, b).collect()[0]["rho"] == pytest.approx(-1.0)


def test_rho_hand_value(spark):
    # permutation (0,1,2,3) vs (1,0,3,2): d = 1 each, Σd² = 4
    # ρ = 1 − 6·4 / (4·15) = 0.6
    a = _scores(spark, [(1, 40), (2, 30), (3, 20), (4, 10)])
    b = _scores(spark, [(1, 30), (2, 40), (3, 10), (4, 20)])
    assert spearman_rho(a, b).collect()[0]["rho"] == pytest.approx(0.6)


def test_intersection_only(spark):
    a = _scores(spark, [(1, 3), (2, 2), (3, 1), (9, 99)])
    b = _scores(spark, [(1, 3), (2, 2), (3, 1), (8, 88)])
    row = spearman_rho(a, b).collect()[0]
    assert row["n_common"] == 3 and row["rho"] == pytest.approx(1.0)


def test_tie_break_deterministic(spark):
    # equal scores order by id: same on both sides → rho 1
    a = _scores(spark, [(i, 5) for i in range(8)])
    assert spearman_rho(a, a).collect()[0]["rho"] == pytest.approx(1.0)


def test_topk_overlap_values(spark):
    a = _scores(spark, [(i, i) for i in range(10)])  # top3: 9,8,7
    b = _scores(spark, [(i, -i) for i in range(10)])  # top3: 0,1,2
    row = top_k_overlap(a, b, k=3).collect()[0]
    assert (row["n_both"], row["jaccard"]) == (0, 0.0)
    row2 = top_k_overlap(a, a, k=3).collect()[0]
    assert (row2["n_both"], row2["jaccard"]) == (3, 1.0)


def test_positions_form_permutation_with_ties(spark):
    # heavy score ties: positions must still form a permutation (ties
    # broken by id), stable under input repartitioning
    a = _scores(spark, [(i, i % 3) for i in range(50)])
    rows = rank_positions(a).collect()
    assert sorted(r["pos"] for r in rows) == list(range(50))
    again = {r["id"]: r["pos"] for r in rank_positions(a.repartition(7)).collect()}
    assert again == {r["id"]: r["pos"] for r in rows}
