"""Exact quantiles + histograms (operators/stats.py)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from amanogawa_spark.operators.stats import exact_quantiles, numeric_histogram


def test_exact_quantiles_match_sorted_ranks(spark):
    rng = random.Random(7)
    vals = [round(rng.uniform(0, 100), 3) for _ in range(997)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "x", qs).collect()}
    s = sorted(vals)
    for q in qs:
        assert got[q] == s[int(math.floor(q * (len(s) - 1)))], q


def test_exact_quantiles_with_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [(v,) for v in [5.0, 5.0, 5.0, 1.0, None, 9.0]], "x double"
    )
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "x", [0.0, 0.5, 1.0]).collect()}
    assert got == {0.0: 1.0, 0.5: 5.0, 1.0: 9.0}


def test_quantiles_repartition_invariant(spark):
    vals = [(float(i % 37),) for i in range(500)]
    a = exact_quantiles(spark.createDataFrame(vals, "x double"), "x", [0.25, 0.75])
    b = exact_quantiles(
        spark.createDataFrame(vals, "x double").repartition(13), "x", [0.25, 0.75]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_histogram_counts_and_clamping(spark):
    vals = [0.0, 7.9, 8.0, 15.0, 63.9, -5.0, 200.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r["bin"]: r for r in numeric_histogram(df, "x", 0.0, 64.0, 8).collect()}
    assert rows[0]["cnt"] == 3  # 0.0, 7.9, and clamped -5.0
    assert rows[1]["cnt"] == 2  # 8.0, 15.0
    assert rows[7]["cnt"] == 2  # 63.9 and clamped 200.0
    assert rows[0]["lo_edge"] == 0.0 and rows[0]["hi_edge"] == 8.0
    assert sum(r["cnt"] for r in rows.values()) == len(vals)


def test_exact_quantiles_leaves_no_pinned_cache(spark):
    """The ranked full-column frame is unpersisted before returning — only
    the |qs|-row local result outlives the call (ADVICE r3)."""
    from amanogawa_spark.operators.stats import exact_quantiles

    spark.sparkContext._jvm.System.gc()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = spark.range(0, 500).selectExpr("cast(id as double) as x")
    out = exact_quantiles(df, "x", [0.0, 0.5, 1.0])
    got = {r["q"]: r["value"] for r in out.collect()}
    assert got == {0.0: 0.0, 0.5: 249.0, 1.0: 499.0}
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before


def test_hll_distinct_by_accuracy_and_invariance(spark):
    from amanogawa_spark.operators.sketch import hll_distinct_by

    rows = [(f"g{i % 3}", i % (200 * (1 + i % 3))) for i in range(6000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    est = {r["grp"]: r["estimate"] for r in hll_distinct_by(df, "grp", "v").collect()}
    exact = {
        r["grp"]: r["n"]
        for r in df.groupBy("grp").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05, (g, est[g], exact[g])
    est2 = {
        r["grp"]: r["estimate"]
        for r in hll_distinct_by(df.repartition(13), "grp", "v").collect()
    }
    assert est == est2


def test_grouped_quantiles_hand_values(spark):
    import pytest as _pytest

    from amanogawa_spark.operators.stats import grouped_quantiles

    rows = [("a", v) for v in [10, 20, 30, 40, 50]] + [("b", v) for v in [7, 9]]
    df = spark.createDataFrame(rows, ["source", "n"])
    got = {
        (r["group"], r["q"]): r["value"]
        for r in grouped_quantiles(df, "source", "n", [0.0, 0.5, 1.0]).collect()
    }
    assert got[("a", 0.0)] == 10.0
    assert got[("a", 0.5)] == 30.0
    assert got[("a", 1.0)] == 50.0
    # group b: n=2 → q=0.5 rank floor(0.5*1)=0 → 7 (lower interpolation)
    assert got[("b", 0.5)] == 7.0
    assert got[("b", 1.0)] == 9.0

    with _pytest.raises(ValueError):
        grouped_quantiles(df, "source", "n", [])


def test_grouped_quantiles_null_exclusion(spark):
    from amanogawa_spark.operators.stats import grouped_quantiles

    df = spark.createDataFrame(
        [("a", None), ("a", 4), ("a", 2)], ["source", "n"]
    )
    got = {
        r["q"]: r["value"]
        for r in grouped_quantiles(df, "source", "n", [0.0, 1.0]).collect()
    }
    assert got == {0.0: 2.0, 1.0: 4.0}


def test_hll_overlap_accuracy_and_union_identity(spark):
    """Inclusion-exclusion overlap estimate lands within HLL error of the
    exact intersection, and the union estimate equals hll_distinct of the
    concatenated set (register-wise max IS the union sketch)."""
    from amanogawa_spark.operators.sketch import (
        hll_distinct,
        hll_overlap,
        hll_registers,
    )

    a_vals = [f"k{i}" for i in range(4000)]
    b_vals = [f"k{i}" for i in range(2500, 8000)]  # |A∩B| = 1500
    da = spark.createDataFrame([(v,) for v in a_vals], "v string")
    db = spark.createDataFrame([(v,) for v in b_vals], "v string")
    row = hll_overlap(hll_registers(da, "v"), hll_registers(db, "v")).collect()[0]
    # p=12 ⇒ rel err ~1.04/sqrt(4096) ≈ 1.6%; intersection error compounds
    assert abs(row["est_a"] - 4000) / 4000 < 0.10
    assert abs(row["est_b"] - 5500) / 5500 < 0.10
    assert abs(row["est_union"] - 8000) / 8000 < 0.10
    assert abs(row["est_intersection"] - 1500) / 1500 < 0.35
    assert 0.0 <= row["jaccard"] <= 1.0
    union_direct = hll_distinct(da.unionAll(db), "v").collect()[0]["estimate"]
    assert row["est_union"] == union_direct


def test_hll_overlap_disjoint_clamps_at_zero(spark):
    from amanogawa_spark.operators.sketch import hll_overlap, hll_registers

    da = spark.createDataFrame([(f"a{i}",) for i in range(1000)], "v string")
    db = spark.createDataFrame([(f"b{i}",) for i in range(1000)], "v string")
    row = hll_overlap(hll_registers(da, "v"), hll_registers(db, "v")).collect()[0]
    assert row["est_intersection"] >= 0.0
    assert row["jaccard"] < 0.05


def test_ranking_auc_matches_bruteforce(spark):
    import random

    from amanogawa_spark.operators.stats import ranking_auc

    rng = random.Random(17)
    rows = [
        (float(rng.choice([0, 1, 2, 3, 4, 5])), rng.randrange(2))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = ranking_auc(df).collect()[0]
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
    assert abs(got["auc"] - want) < 1e-12


def test_ranking_auc_edges_and_invariance(spark):
    from amanogawa_spark.operators.stats import ranking_auc

    # perfect ranker -> 1.0; inverted -> 0.0; constant -> 0.5
    perfect = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "score double, label int"
    )
    assert ranking_auc(perfect).collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)], "score double, label int"
    )
    assert ranking_auc(inverted).collect()[0]["auc"] == 0.0
    const = spark.createDataFrame(
        [(1.0, 0), (1.0, 1), (1.0, 0), (1.0, 1)], "score double, label int"
    )
    assert ranking_auc(const).collect()[0]["auc"] == 0.5
    # repartitioning must not change the result
    import random

    rng = random.Random(3)
    rows = [(rng.random(), rng.randrange(2)) for _ in range(300)]
    df = spark.createDataFrame(rows, "score double, label int")
    a = ranking_auc(df).collect()[0]
    b = ranking_auc(df.repartition(13), num_partitions=5).collect()[0]
    assert a["auc"] == b["auc"] and a["n_pos"] == b["n_pos"]
