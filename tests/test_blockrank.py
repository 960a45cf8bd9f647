from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.blockrank import (
    blockrank,
    blockrank_init,
    local_block_pagerank,
)
from amanogawa_spark.graph.pagerank import pagerank


@pytest.fixture(scope="module")
def blocky(spark):
    """Six hub-skewed blocks of very different sizes, strongly
    inter-linked (every block has true out-of-block links)."""
    rnd = random.Random(3)
    sizes = [5, 9, 14, 20, 30, 42]
    starts = [sum(sizes[:i]) for i in range(len(sizes))]
    n_total = sum(sizes)
    edges, block_rows = [], []
    for bi, sz in enumerate(sizes):
        ids = list(range(starts[bi], starts[bi] + sz))
        for u in ids:
            block_rows.append((u, bi))
            edges.append((u, ids[0]))
            edges.append((u, rnd.choice(ids)))
        for _ in range(4):
            tgt = rnd.randrange(n_total)
            while starts[bi] <= tgt < starts[bi] + sz:
                tgt = rnd.randrange(n_total)
            edges.append((rnd.choice(ids), tgt))
    e = spark.createDataFrame(
        sorted({(a, b) for a, b in edges if a != b}), ["src_id", "dst_id"]
    ).persist()
    v = (
        e.select(F.col("src_id").alias("id"))
        .union(e.select("dst_id"))
        .distinct()
        .persist()
    )
    blocks = spark.createDataFrame(block_rows, ["id", "blk"]).join(v, "id").persist()
    e.count(), v.count(), blocks.count()
    return v, e, blocks


def test_local_block_pagerank_unit_mass_per_block(spark, blocky):
    _, e, blocks = blocky
    loc = local_block_pagerank(e, blocks, iters=3)
    masses = loc.groupBy("blk").agg(F.sum("local_r").alias("s")).collect()
    assert len(masses) == 6
    for r in masses:
        assert abs(r["s"] - 1.0) < 1e-9


def test_blockrank_init_unit_mass(spark, blocky):
    _, e, blocks = blocky
    init = blockrank_init(e, blocks, local_iters=2, block_iters=2)
    assert abs(init.agg(F.sum("rank")).collect()[0][0] - 1.0) < 1e-9


def test_blockrank_same_fixpoint_fewer_iterations(spark, blocky):
    v, e, blocks = blocky
    cold = pagerank(v, e, tol=1e-6, max_iter=80)
    warm = blockrank(
        v, e, blocks, tol=1e-6, max_iter=80, local_iters=6, block_iters=12,
        warm_min_edges=0,  # force the warm start below the work gate
    )
    # identical fixpoint (the init cannot change the attractor)
    c = {r["id"]: r[1] for r in cold.ranks.collect()}
    w = {r["id"]: r[1] for r in warm.ranks.collect()}
    assert max(abs(c[i] - w[i]) for i in c) < 1e-5
    # the warm start must actually pay: fewer global edge-shuffle rounds
    assert warm.iterations < cold.iterations
    # and its very first delta must be far below the cold start's
    assert warm.history[0]["l1_delta"] < 0.3 * cold.history[0]["l1_delta"]


def test_blockrank_work_gate_auto_skips_small_graphs(spark, blocky):
    """Below warm_min_edges the init phase is skipped entirely (its fixed
    barrier-job ladder loses wall at small scale, BENCH_r04: warm 78.7 s
    vs cold 41.1 s) and blockrank degrades to the cold solver; gate_info
    records the decision."""
    v, e, blocks = blocky
    cold = pagerank(v, e, tol=1e-6, max_iter=80)
    gate: dict = {}
    gated = blockrank(
        v, e, blocks, tol=1e-6, max_iter=80, gate_info=gate
    )
    assert gate["warm_start"] is False
    assert gate["edges"] == e.count() and gate["warm_min_edges"] == 10_000_000
    # identical to cold: same iteration count and same first-round delta
    assert gated.iterations == cold.iterations
    assert abs(gated.history[0]["l1_delta"] - cold.history[0]["l1_delta"]) < 1e-12
    # forcing via warm_min_edges=0 flips the gate
    gate2: dict = {}
    forced = blockrank(
        v, e, blocks, tol=1e-6, max_iter=3, local_iters=2, block_iters=4,
        warm_min_edges=0, edge_count=42, gate_info=gate2,
    )
    assert gate2["warm_start"] is True and gate2["edges"] == 42
    assert forced.history[0]["l1_delta"] < cold.history[0]["l1_delta"]
