"""Incremental PageRank repair vs a cold rerun (graph/incremental.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from amanogawa_spark.graph.incremental import incremental_pagerank
from amanogawa_spark.graph.pagerank import pagerank


def _graph(spark, n=120, deg=4, seed=11):
    rng = random.Random(seed)
    pairs = []
    for u in range(n):
        if u % 17 == 0:
            continue  # leave some vertices dangling
        for t in rng.sample(range(n), deg):
            if t != u:
                pairs.append((u, t))
    verts = spark.range(n).select(F.col("id"))
    edges = spark.createDataFrame(sorted(set(pairs)), "src_id long, dst_id long")
    return verts, edges


def _recrawl(spark, edges, seed=23):
    """Deterministic churn: drop ~10% of edges, add ~10% new ones, make one
    vertex newly dangling and give one dangling vertex out-links."""
    rng = random.Random(seed)
    rows = sorted((r["src_id"], r["dst_id"]) for r in edges.collect())
    n = 120
    kept = [p for p in rows if rng.random() > 0.10]
    added = set()
    while len(added) < len(rows) // 10:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v and u % 17 != 0:
            added.add((u, v))
    survivors = [p for p in kept if p[0] != 5] + sorted(added)  # 5 goes dangling
    survivors += [(17, 3), (17, 42)]  # 17 was dangling, now pushes
    return spark.createDataFrame(sorted(set(survivors)), "src_id long, dst_id long")


def test_incremental_matches_cold_rerun(spark):
    verts, old_edges = _graph(spark)
    new_edges = _recrawl(spark, old_edges)
    old = pagerank(verts, old_edges, tol=1e-12, max_iter=300)
    cold = pagerank(verts, new_edges, tol=1e-12, max_iter=300)
    inc = incremental_pagerank(old.ranks, old_edges, new_edges, tol=1e-9)
    got = {r["id"]: r["rank"] for r in inc.ranks.collect()}
    want = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    assert set(got) == set(want)
    worst = max(abs(got[i] - want[i]) for i in got)
    assert worst < 1e-6, worst
    # rank mass stays a probability vector through the analytic C-fold,
    # up to the documented stop bound tol*d/(1-d) = 5.67e-9 at tol=1e-9
    assert abs(sum(got.values()) - 1.0) < 6e-9


def test_no_change_is_identity_and_zero_rounds(spark):
    verts, edges = _graph(spark)
    old = pagerank(verts, edges, tol=1e-10, max_iter=300)
    inc = incremental_pagerank(old.ranks, edges, edges)
    assert inc.iterations == 0
    got = {r["id"]: r["rank"] for r in inc.ranks.collect()}
    want = {r["id"]: r["rank"] for r in old.ranks.collect()}
    assert max(abs(got[i] - want[i]) for i in got) == 0.0


def test_fixed_rounds_partition_invariant(spark):
    verts, old_edges = _graph(spark)
    new_edges = _recrawl(spark, old_edges)
    # dangling-free universe for the oracle-mode check (materialized in
    # the driver: a lazy self-semi-join here is the classic Spark
    # self-join ambiguity trap and resolves differently inside larger
    # plans — the fixture must be a plain literal table)
    def _dangling_free(edges):
        rows = {(r["src_id"], r["dst_id"]) for r in edges.collect()}
        while True:  # removing a sink's in-edges can orphan its sources
            srcs = {u for u, _ in rows}
            nxt = {p for p in rows if p[1] in srcs}
            if nxt == rows:
                return spark.createDataFrame(sorted(rows), "src_id long, dst_id long")
            rows = nxt

    nd_old = _dangling_free(old_edges)
    nd_new = _dangling_free(new_edges)
    seed = pagerank(verts, nd_old, tol=1e-8, max_iter=200)
    a = incremental_pagerank(seed.ranks, nd_old, nd_new, fixed_rounds=3)
    b = incremental_pagerank(
        seed.ranks.repartition(7), nd_old.repartition(5), nd_new.repartition(3),
        fixed_rounds=3,
    )
    ga = {r["id"]: r["rank"] for r in a.ranks.collect()}
    gb = {r["id"]: r["rank"] for r in b.ranks.collect()}
    assert set(ga) == set(gb)
    # state rounds to 12 decimals per round; residual re-aggregation order
    # may wiggle the last retained digit, never more
    assert max(abs(ga[i] - gb[i]) for i in ga) < 1e-9


def test_incremental_components_equals_cold_with_splits_and_merges(spark):
    from amanogawa_spark.graph.components import connected_components
    from amanogawa_spark.graph.incremental import incremental_components

    # three chains + isolated vertices
    old_pairs = (
        [(i, i + 1) for i in range(0, 9)]          # chain 0..9 (one component)
        + [(i, i + 1) for i in range(20, 29)]      # chain 20..29
        + [(i, i + 1) for i in range(40, 49)]      # chain 40..49
    )
    # recrawl: split the first chain in the middle (remove 4-5), split the
    # second chain twice (remove 23-24 and 26-27), merge chain-3's halves
    # into chain-1's tail (add 49-9), and bridge two split fragments (24-26)
    new_pairs = [
        p for p in old_pairs if p not in {(4, 5), (23, 24), (26, 27)}
    ] + [(49, 9), (24, 26)]
    verts = spark.createDataFrame([(i,) for i in range(60)], "id long")
    old_e = spark.createDataFrame(old_pairs, "src_id long, dst_id long")
    new_e = spark.createDataFrame(new_pairs, "src_id long, dst_id long")

    old = connected_components(verts, old_e)
    cold = connected_components(verts, new_e)
    inc = incremental_components(old, old_e, new_e)

    got = sorted(tuple(r) for r in inc.collect())
    want = sorted(tuple(r) for r in cold.collect())
    assert got == want


def test_incremental_components_no_removals_no_additions(spark):
    from amanogawa_spark.graph.components import connected_components
    from amanogawa_spark.graph.incremental import incremental_components

    pairs = [(0, 1), (1, 2), (5, 6)]
    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    e = spark.createDataFrame(pairs, "src_id long, dst_id long")
    old = connected_components(verts, e)
    inc = incremental_components(old, e, e)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, old.collect()))


def test_incremental_triangles_matches_cold(spark):
    import random as _random

    from amanogawa_spark.graph.incremental import incremental_triangles
    from amanogawa_spark.graph.triangles import triangle_total

    rng = _random.Random(5)
    n = 60
    old_pairs = {tuple(sorted((rng.randrange(n), rng.randrange(n)))) for _ in range(260)}
    old_pairs = {(a, b) for a, b in old_pairs if a != b}
    new_pairs = {p for p in old_pairs if rng.random() > 0.15}
    # additions engineered to overlap: a fully-added triangle, edges sharing
    # wedges with each other, and edges closing existing wedges
    new_pairs |= {(50, 51), (51, 52), (50, 52), (0, 51), (1, 51)}
    while len(new_pairs) < len(old_pairs) + 10:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            new_pairs.add(tuple(sorted((a, b))))
    old_e = spark.createDataFrame(sorted(old_pairs), "src_id long, dst_id long")
    new_e = spark.createDataFrame(sorted(new_pairs), "src_id long, dst_id long")

    t_old = triangle_total(old_e).collect()[0]["n_triangles"]
    t_new_cold = triangle_total(new_e).collect()[0]["n_triangles"]
    row = incremental_triangles(t_old, old_e, new_e).collect()[0]
    assert row["n_old"] == t_old
    assert row["n_new"] == t_new_cold, (row["delta"], t_new_cold - t_old)
    # identity churn
    same = incremental_triangles(t_old, old_e, old_e).collect()[0]
    assert same["delta"] == 0 and same["n_new"] == t_old
