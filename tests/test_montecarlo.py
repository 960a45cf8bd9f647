from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.montecarlo import pagerank_montecarlo
from amanogawa_spark.graph.pagerank import pagerank


@pytest.fixture(scope="module")
def hub_graph(spark):
    # 60 vertices, 3 hubs absorbing ~half the link mass
    rnd = random.Random(5)
    edges = set()
    for v in range(60):
        for _ in range(4):
            dst = rnd.choice([0, 1, 2]) if rnd.random() < 0.5 else rnd.randrange(60)
            if dst != v:
                edges.add((v, dst))
    e = spark.createDataFrame(sorted(edges), ["src_id", "dst_id"]).persist()
    e.count()
    return e


def test_mc_pagerank_approximates_power_iteration(spark, hub_graph):
    mc = {
        r["id"]: r["pr_est"]
        for r in pagerank_montecarlo(
            hub_graph, walks_per_vertex=32, max_len=24
        ).collect()
    }
    verts = (
        hub_graph.select(F.col("src_id").alias("id"))
        .union(hub_graph.select("dst_id"))
        .distinct()
    )
    ex = {r["id"]: r[1] for r in pagerank(verts, hub_graph).ranks.collect()}
    assert set(mc) == set(ex)
    # estimator is unbiased up to the geometric tail: total mass ~ 1
    assert 0.85 < sum(mc.values()) < 1.15
    # the 3 hubs dominate both rankings
    top_mc = sorted(mc, key=mc.get, reverse=True)[:3]
    top_ex = sorted(ex, key=ex.get, reverse=True)[:3]
    assert set(top_mc) == set(top_ex)
    n = len(ex)
    mae = sum(abs(mc[i] - ex[i]) for i in ex) / n
    assert mae < 0.15 / n  # mean |err| well under the uniform rank 1/n


def test_mc_pagerank_deterministic_and_counts_dangling_starts(spark):
    # vertex 3 is dangling (no out-edges): it must still appear with its
    # own start visits plus whatever walks land on it
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3), (2, 3)], ["src_id", "dst_id"]
    )
    a = sorted(
        tuple(r)
        for r in pagerank_montecarlo(e, walks_per_vertex=4, max_len=6).collect()
    )
    b = sorted(
        tuple(r)
        for r in pagerank_montecarlo(
            e.repartition(5), walks_per_vertex=4, max_len=6
        ).collect()
    )
    assert a == b
    by_id = {r[0]: r[1] for r in a}
    assert by_id[3] >= 4  # 4 start visits even with zero out-degree
    assert all(v >= 4 for v in by_id.values())


def test_mc_pagerank_renormalize_sums_to_one(spark):
    # dangling-heavy graph: raw complete-path estimates sum well below 1
    # (walks die at dangling vertices); renormalize=True rescales to unit
    # mass without changing the ranking
    e = spark.createDataFrame(
        [(0, 3), (1, 3), (2, 3), (0, 4), (1, 4)], ["src_id", "dst_id"]
    )
    raw = pagerank_montecarlo(e, walks_per_vertex=8, max_len=8)
    norm = pagerank_montecarlo(e, walks_per_vertex=8, max_len=8, renormalize=True)
    raw_total = raw.agg(F.sum("pr_est")).first()[0]
    norm_total = norm.agg(F.sum("pr_est")).first()[0]
    assert raw_total < 0.999  # documented downward bias
    assert abs(norm_total - 1.0) < 1e-9
    raw_rank = [r["id"] for r in raw.orderBy(F.desc("pr_est"), "id").collect()]
    norm_rank = [r["id"] for r in norm.orderBy(F.desc("pr_est"), "id").collect()]
    assert raw_rank == norm_rank


def test_mc_pagerank_md5_seed_is_documented_noop(spark):
    # oracle-parity contract: md5 walks ignore seed; xxhash64 honors it
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], ["src_id", "dst_id"])
    m1 = sorted(tuple(r) for r in pagerank_montecarlo(
        e, walks_per_vertex=4, max_len=6, hash="md5", seed=1).collect())
    m2 = sorted(tuple(r) for r in pagerank_montecarlo(
        e, walks_per_vertex=4, max_len=6, hash="md5", seed=99).collect())
    assert m1 == m2
    x1 = sorted(tuple(r) for r in pagerank_montecarlo(
        e, walks_per_vertex=4, max_len=16, seed=1).collect())
    x2 = sorted(tuple(r) for r in pagerank_montecarlo(
        e, walks_per_vertex=4, max_len=16, seed=99).collect())
    assert x1 != x2
