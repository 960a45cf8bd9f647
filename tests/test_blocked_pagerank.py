"""Layout-aware blocked PageRank (graph/blocked.py) — the partition-map
consumer demanded by VERDICT r3 item 4.

Pins three properties:
1. identical ranks to the classic ``pagerank()`` plan (allclose 1e-12),
   on BOTH a clustered and a random pid map — the layout changes where
   bytes move, never the fixed point;
2. the per-iteration edge⋈ranks join is edge-stationary: Spark accepts
   the shared (spid, salt) subset partitioning and inserts NO
   ENSURE_REQUIREMENTS exchange for the join keys;
3. the partial-aggregation locality win is real: on a block-local graph
   the clustered layout's contribution aggregation emits measurably
   fewer map-side partial rows than the random layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.blocked import (
    blocked_edges,
    blocked_pagerank,
    iteration_join_plan,
)
from amanogawa_spark.graph.pagerank import pagerank


def _toy_graph(spark, n=120, block=30):
    """n vertices in n/block blocks; dense intra-block ring + sparse
    cross-block bridges; a few dangling vertices."""
    pairs = []
    for i in range(n - 10):  # last 10 dangling
        b_lo = (i // block) * block
        pairs.append((i, b_lo + (i + 1 - b_lo) % block))
        pairs.append((i, b_lo + (i + 7 - b_lo) % block))
        if i % 13 == 0:
            pairs.append((i, (i + block) % n))
    e = spark.createDataFrame(
        [(a, b) for a, b in pairs if a != b], "src_id long, dst_id long"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    clustered = spark.createDataFrame(
        [(i, i // block) for i in range(n)], "id long, pid long"
    )
    rnd = spark.createDataFrame(
        [(i, (i * 2654435761) % (n // block)) for i in range(n)], "id long, pid long"
    )
    return v, e, clustered, rnd


def test_blocked_matches_classic_on_both_layouts(spark):
    v, e, clustered, rnd = _toy_graph(spark)
    want = {
        r["id"]: r["rank"]
        for r in pagerank(v, e, tol=-1.0, max_iter=6).ranks.collect()
    }
    for labels in (clustered, rnd):
        got = {
            r["id"]: r["rank"]
            for r in blocked_pagerank(v, e, labels, max_iter=6).ranks.collect()
        }
        assert set(got) == set(want)
        for i in want:
            assert got[i] == pytest.approx(want[i], abs=1e-12), i


def test_iteration_join_is_edge_stationary(spark):
    v, e, clustered, _ = _toy_graph(spark)
    eb = blocked_edges(e, clustered, n_salt=2, num_partitions=8)
    ranks_like = (
        v.select(
            (F.col("id") % 4).alias("spid"),
            (F.col("id") % 2).alias("salt"),
            F.col("id").alias("src_id"),
            F.lit(0.1).alias("rank"),
        )
        .repartition(8, "spid", "salt")
    )
    plan = iteration_join_plan(eb, ranks_like)
    # a re-shuffle for THIS join would be an ENSURE_REQUIREMENTS exchange on
    # the full key set hash(spid, salt, src_id); exchanges printed inside
    # the InMemoryRelation subtree are the one-time layout build, not
    # per-iteration cost
    bad = [
        line
        for line in plan.splitlines()
        if "Exchange" in line
        and "ENSURE_REQUIREMENTS" in line
        and "spid" in line
        and "salt" in line
    ]
    assert not bad, f"join re-shuffled a side:\n{plan}"
    assert "InMemoryTableScan" in plan
    eb.unpersist()


def test_clustered_layout_reduces_agg_partials(spark):
    """Map-side combine output (distinct dsts per partition) shrinks under
    the clustered layout — the shuffle-bytes mechanism, measured at the
    row level so the test is runtime-independent."""
    v, e, clustered, rnd = _toy_graph(spark, n=1200, block=100)

    def partial_rows(labels):
        eb = blocked_edges(e, labels, n_salt=1, num_partitions=12)
        cnt = (
            eb.groupBy(F.spark_partition_id().alias("p"), "dst_id")
            .count()
            .count()
        )
        eb.unpersist()
        return cnt

    clu, ran = partial_rows(clustered), partial_rows(rnd)
    assert clu < ran * 0.7, (clu, ran)
