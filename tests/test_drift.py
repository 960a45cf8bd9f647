from __future__ import annotations

import math

from amanogawa_spark.operators.drift import ks_statistic, psi_bins


def _ks_brute(xs, ys):
    vals = sorted(set(xs) | set(ys))
    d = 0.0
    for v in vals:
        fa = sum(1 for x in xs if x <= v) / len(xs)
        fb = sum(1 for y in ys if y <= v) / len(ys)
        d = max(d, abs(fa - fb))
    return d


def test_ks_matches_bruteforce(spark):
    xs = [1, 2, 2, 3, 5, 8, 8, 9]
    ys = [2, 3, 3, 4, 4, 7, 10]
    a = spark.createDataFrame([(v,) for v in xs], ["x"])
    b = spark.createDataFrame([(v,) for v in ys], ["x"])
    row = ks_statistic(a, b, "x").collect()[0]
    assert (row["n_a"], row["n_b"]) == (len(xs), len(ys))
    assert abs(row["ks_r"] - _ks_brute(xs, ys)) < 1e-8  # ks_r is rounded to 8dp


def test_ks_identical_distributions_zero(spark):
    a = spark.createDataFrame([(v,) for v in range(50)], ["x"])
    row = ks_statistic(a, a, "x").collect()[0]
    assert row["ks_r"] == 0.0
    # disjoint supports -> D = 1
    b = spark.createDataFrame([(v + 100,) for v in range(50)], ["x"])
    assert ks_statistic(a, b, "x").collect()[0]["ks_r"] == 1.0


def test_psi_hand_computed_and_symmetry(spark):
    a = spark.createDataFrame([(v,) for v in [1, 1, 5, 5, 5, 9]], ["x"])
    b = spark.createDataFrame([(v,) for v in [1, 5, 9, 9, 9, 9]], ["x"])
    rows = psi_bins(a, b, "x", breaks=[4.0, 8.0]).collect()
    got = {r["bin"]: r for r in rows}
    assert {r["bin"] for r in rows} == {0, 1, 2}
    # hand mirror with smoothing 0.5, 3 bins
    na, nb = 6.0, 6.0
    counts = {0: (2, 1), 1: (3, 1), 2: (1, 4)}
    for bin_, (ca, cb) in counts.items():
        pa = (ca + 0.5) / (na + 1.5)
        pb = (cb + 0.5) / (nb + 1.5)
        want = round((pa - pb) * math.log(pa / pb), 8)
        assert got[bin_]["n_a"] == ca and got[bin_]["n_b"] == cb
        assert abs(got[bin_]["psi_term_r"] - want) < 1e-9
        assert got[bin_]["psi_term_r"] >= 0.0  # each PSI term is non-negative
    # identical snapshots -> zero PSI everywhere
    z = psi_bins(a, a, "x", breaks=[4.0, 8.0]).collect()
    assert all(r["psi_term_r"] == 0.0 for r in z)
