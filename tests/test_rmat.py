from __future__ import annotations

from amanogawa_spark.graph.generate import rmat_edges


def test_rmat_shape_and_bounds(spark):
    df = rmat_edges(spark, scale=8, edge_factor=4, seed=3).persist()
    n, m = 1 << 8, 4 << 8
    assert df.count() == m
    lo_hi = df.selectExpr(
        "min(src_id) s0", "max(src_id) s1", "min(dst_id) d0", "max(dst_id) d1"
    ).first()
    assert 0 <= lo_hi["s0"] and lo_hi["s1"] < n
    assert 0 <= lo_hi["d0"] and lo_hi["d1"] < n
    df.unpersist()


def test_rmat_deterministic_across_partitionings_and_hashes(spark):
    for h in ("xxhash64", "md5"):
        a = sorted(tuple(r) for r in rmat_edges(spark, 6, 4, seed=9, hash=h).collect())
        b = sorted(
            tuple(r)
            for r in rmat_edges(
                spark, 6, 4, seed=9, hash=h, num_partitions=13
            ).collect()
        )
        assert a == b, h
    # different seeds decorrelate
    c = sorted(tuple(r) for r in rmat_edges(spark, 6, 4, seed=10).collect())
    assert c != a


def test_rmat_degree_skew(spark):
    # a=0.57 concentrates mass in the low-id quadrant: the max out-degree
    # must far exceed the uniform expectation m/n (=16), and vertex ids in
    # the top decile of degree should skew low
    from pyspark.sql import functions as F

    df = rmat_edges(spark, scale=10, edge_factor=16, seed=1)
    deg = df.groupBy("src_id").agg(F.count("*").alias("d"))
    top = deg.orderBy(F.desc("d")).first()
    assert top["d"] > 64, top
    assert top["src_id"] < 128  # hubs live in the repeatedly-chosen a-quadrant


def test_rmat_plan_is_shuffle_free(spark):
    plan = rmat_edges(spark, scale=12, edge_factor=16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_rmat_rejects_individually_invalid_probabilities(spark):
    import pytest

    from amanogawa_spark.graph.generate import rmat_edges

    # sums to 0.9 (passes the old check) but b < 0 inverts thresholds
    with pytest.raises(ValueError, match="each"):
        rmat_edges(spark, scale=3, edge_factor=2, a=0.9, b=-0.2, c=0.2)
    with pytest.raises(ValueError, match="each"):
        rmat_edges(spark, scale=3, edge_factor=2, a=1.2, b=-0.3, c=0.05)
