"""Algorithm oracles for the LSH banding planner."""

from __future__ import annotations

from amanogawa_spark.operators.dedup import lsh_plan, pick_bands


def test_plan_covers_all_divisor_splits(spark):
    rows = lsh_plan(spark, num_hashes=64, threshold=0.8).collect()
    assert sorted(r["bands"] for r in rows) == [1, 2, 4, 8, 16, 32, 64]
    for r in rows:
        assert r["bands"] * r["rows_per_band"] == 64
        assert 0.0 <= r["p_at_threshold"] <= 1.0
        assert abs(r["total_err"] - (r["fp_mass"] + r["fn_mass"])) < 1e-8


def test_scurve_monotonicity(spark):
    """More bands (shorter rows) -> higher recall at the threshold and a
    lower inflection point."""
    rows = {r["bands"]: r for r in lsh_plan(spark, 64, 0.8).collect()}
    assert rows[64]["p_at_threshold"] > rows[16]["p_at_threshold"] > rows[4]["p_at_threshold"]
    assert rows[64]["threshold_est"] < rows[16]["threshold_est"] < rows[4]["threshold_est"]


def test_pick_bands_matches_plan_argmin(spark):
    rows = lsh_plan(spark, 64, 0.8).collect()
    best = min(rows, key=lambda r: (r["total_err"], r["bands"]))
    assert pick_bands(64, 0.8) == best["bands"]


def test_fn_weight_shifts_toward_recall():
    balanced = pick_bands(64, 0.8)
    recall_heavy = pick_bands(64, 0.8, fn_weight=20.0)
    assert recall_heavy > balanced  # more bands = higher recall
