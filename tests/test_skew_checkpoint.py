"""Skew machinery (salting, hot/cold join) + checkpoint manager tests."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.checkpoint import CheckpointManager
from amanogawa_spark.graph.build import degree_histogram
from amanogawa_spark.graph.skew import hot_keys, salted_group_sum, split_hot_cold_join


@pytest.fixture(scope="module")
def zipf_edges(spark):
    """FIXTURES.md §5: one hub dst receives >= 20% of all edges."""
    rng = random.Random(3)
    rows = []
    for i in range(5000):
        dst = 0 if rng.random() < 0.25 else rng.randrange(1, 200)
        rows.append((rng.randrange(1000), dst, float(rng.randrange(100))))
    return spark.createDataFrame(rows, "src_id long, dst_id long, w double")


def test_hot_key_detection(spark, zipf_edges):
    hot = hot_keys(zipf_edges, "dst_id", threshold=500)
    vals = [r.dst_id for r in hot.collect()]
    assert vals == [0]


def test_salted_group_sum_equals_direct(spark, zipf_edges):
    direct = {
        r.dst_id: r.s
        for r in zipf_edges.groupBy("dst_id").agg(F.sum("w").alias("s")).collect()
    }
    salted = {
        r.dst_id: r.s
        for r in salted_group_sum(zipf_edges, "dst_id", "w", "s", salt_factor=8).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        assert abs(direct[k] - salted[k]) < 1e-6


def test_split_hot_cold_join_equals_plain(spark, zipf_edges):
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(200)], "dst_id long, dname string"
    )
    hot = hot_keys(zipf_edges, "dst_id", threshold=500)
    plain = zipf_edges.join(dim, "dst_id").groupBy("dst_id").count()
    split = split_hot_cold_join(zipf_edges, dim, "dst_id", hot).groupBy("dst_id").count()
    a = {(r.dst_id, r["count"]) for r in plain.collect()}
    b = {(r.dst_id, r["count"]) for r in split.collect()}
    assert a == b


def test_degree_histogram(spark, zipf_edges):
    hist = degree_histogram(zipf_edges, "dst_id").collect()
    total = sum(r.n_vertices for r in hist)
    assert total == zipf_edges.select("dst_id").distinct().count()
    assert max(r.log2_bucket for r in hist) >= 10  # the hub: >= 1024 in-edges


def test_checkpoint_manager_roundtrip(spark, tmp_path):
    cm = CheckpointManager(spark, str(tmp_path / "ck"), keep_last=2)
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    cm.save(df, 1)
    cm.save(df.withColumn("x", F.col("x") + 1), 2)
    cm.save(df.withColumn("x", F.col("x") + 2), 3)
    assert cm.latest_iteration() == 3
    back = cm.load()
    assert back.count() == 10
    assert {r.x for r in back.collect()} == {i * 2 + 2 for i in range(10)}
    cm.log_metrics(3, delta=0.5)
    assert cm.read_metrics()[-1]["delta"] == 0.5
    # per-partition lineage manifest: rows across partition files == total
    man = cm.read_partition_manifest()
    assert man is not None and man["iteration"] == 3
    assert sum(p["rows"] for p in man["partitions"]) == 10
    assert man["n_partitions"] == len(man["partitions"]) >= 1
