"""Persisted adjacency layouts: bucketed tables must eliminate the edge-side
shuffle; range-sorted parquet must be sorted for row-group pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.layout import (
    assert_no_edge_exchange,
    count_exchanges,
    out_degrees_bucketlocal,
    read_bucketed_edges,
    write_bucketed_edges,
    write_range_sorted_edges,
)


@pytest.fixture(scope="module")
def edges(spark):
    e = spark.range(0, 4000).select(
        (F.col("id") % 97).alias("src_id"), (F.col("id") % 89).alias("dst_id")
    ).filter(F.col("src_id") != F.col("dst_id")).distinct()
    e = e.persist()
    e.count()
    return e


def test_bucketed_groupby_has_no_exchange(spark, edges, tmp_path_factory):
    write_bucketed_edges(edges, "edges_bucketed_t1", n_buckets=8)
    be = read_bucketed_edges(spark, "edges_bucketed_t1")
    deg = out_degrees_bucketlocal(be)
    # hash agg on the bucket key: partial+final collapse, zero shuffles
    plan = assert_no_edge_exchange(deg, max_exchanges=0)
    assert "Exchange" not in plan or "Reused" in plan
    # and it still computes the right thing
    expected = {
        r["id"]: r["out_degree"]
        for r in edges.groupBy(F.col("src_id").alias("id"))
        .agg(F.count("*").alias("out_degree"))
        .collect()
    }
    got = {r["id"]: r["out_degree"] for r in deg.collect()}
    assert got == expected


def test_bucketed_join_shuffles_only_probe_side(spark, edges):
    write_bucketed_edges(edges, "edges_bucketed_t2", n_buckets=8)
    be = read_bucketed_edges(spark, "edges_bucketed_t2")
    ranks = spark.range(0, 97).select(
        F.col("id").alias("src_id"), (F.col("id") * 0.01).alias("rank")
    )
    # disable broadcast so the join planner must pick a shuffle join — the
    # bucketed side still must NOT re-shuffle (1 Exchange total: ranks side)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = be.join(ranks, "src_id").groupBy("src_id").agg(F.sum("rank").alias("s"))
        n_ex = count_exchanges(joined)
        assert n_ex <= 1, f"bucketed join should shuffle only the ranks side, got {n_ex}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_range_sorted_parquet_is_sorted(spark, edges, tmp_path):
    path = os.path.join(str(tmp_path), "edges_sorted")
    write_range_sorted_edges(edges, path, num_partitions=4)
    back = spark.read.parquet(path)
    assert back.distinct().count() == edges.count()
    # per-file sortedness: within every parquet file the (src_id, dst_id)
    # sequence is non-decreasing
    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    assert files
    for f in files:
        t = pq.read_table(f).to_pydict()
        pairs = list(zip(t["src_id"], t["dst_id"]))
        assert pairs == sorted(pairs)
