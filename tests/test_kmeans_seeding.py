"""k-means seeding stays distributed (VERDICT r3 item 2).

The old init ranked ids through a global single-partition window; the
rewrite uses orderBy+limit (TakeOrderedAndProject) plus a broadcast join
back for the vectors.  These tests pin (a) no single-partition Exchange
in the seeding plan and (b) the seeds are exactly the k hash-smallest
ids, identical to the window formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.graph.layout import _physical_plan
from amanogawa_spark.operators.kmeans import seed_vectors


def _vecs(spark, n=200):
    return spark.range(n).select(
        F.col("id"),
        F.array(
            (F.col("id") % 13).cast("double"), (F.col("id") % 7).cast("double")
        ).alias("v"),
    )


def test_seeding_plan_has_no_single_partition_exchange(spark):
    seeds = seed_vectors(_vecs(spark), k=8, seed=0)
    plan = _physical_plan(seeds)
    assert "Exchange SinglePartition" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_seeds_are_the_k_hash_smallest_ids(spark):
    v = _vecs(spark)
    k, seed = 8, 3
    got = sorted(
        (r["_h"], r["id"]) for r in seed_vectors(v, k=k, seed=seed).collect()
    )
    want = sorted(
        (r["_h"], r["id"])
        for r in v.select("id", F.xxhash64("id", F.lit(seed)).alias("_h")).collect()
    )[:k]
    assert got == want


def test_min_id_init_deterministic_and_trains(spark):
    import pyspark.sql.functions as F

    from amanogawa_spark.operators.kmeans import kmeans_centroids

    rows = [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = kmeans_centroids(df, k=3, max_iter=2, tol=0.0, init="min_id")
    b = kmeans_centroids(
        df.repartition(7), k=3, max_iter=2, tol=0.0, init="min_id"
    )
    va = sorted((r["cid"], [round(x, 9) for x in r["cv"]]) for r in a.collect())
    vb = sorted((r["cid"], [round(x, 9) for x in r["cv"]]) for r in b.collect())
    assert va == vb
    assert len(va) == 3


def test_unknown_init_rejected(spark):
    import pytest

    from amanogawa_spark.operators.kmeans import kmeans_centroids

    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_centroids(df, k=2, init="bogus")


def test_simplified_silhouette_hand_mirror(spark):
    import math

    from amanogawa_spark.operators.kmeans import simplified_silhouette

    # two tight planted clusters around (0,0) and (10,10), one straggler
    pts = [
        (0, [0.0, 0.1]), (1, [0.1, 0.0]), (2, [0.2, 0.1]),
        (3, [10.0, 10.1]), (4, [10.1, 9.9]),
        (5, [5.0, 5.0]),  # equidistant-ish straggler
    ]
    cents = [(0, [0.1, 0.1]), (1, [10.0, 10.0])]
    v = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    c = spark.createDataFrame(cents, "cid int, c array<double>")
    got = {
        r["cluster"]: (r["n"], r["mean_sil"])
        for r in simplified_silhouette(v, c).collect()
    }

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    per_cluster = {}
    for _, x in pts:
        ds = sorted((dist(x, cv), cid) for cid, cv in cents)
        (a, cid), (b, _) = ds[0], ds[1]
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        per_cluster.setdefault(cid, []).append(s)
    want = {
        cid: (len(ss), round(sum(ss) / len(ss), 8))
        for cid, ss in per_cluster.items()
    }
    assert got == want
    # tight clusters: silhouettes near 1 despite the straggler
    assert got[0][1] > 0.6 and got[1][1] > 0.6


def test_simplified_silhouette_zero_distance_and_ties(spark):
    from amanogawa_spark.operators.kmeans import simplified_silhouette

    # point ON a centroid -> a=0, s=1; point equidistant to both -> tie
    # breaks to smaller cid with s=0
    v = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<double>"
    )
    c = spark.createDataFrame(
        [(0, [0.0]), (1, [2.0])], "cid int, c array<double>"
    )
    got = {
        r["cluster"]: (r["n"], r["mean_sil"])
        for r in simplified_silhouette(v, c).collect()
    }
    # id 0: a=0 (cid 0), b=2 -> s=1. id 1: d=(1,1) tie -> cid 0, s=0
    assert got == {0: (2, 0.5)}


def _planted(spark, k=4, per=30, dim=6, spread=0.05):
    import random

    rng = random.Random(42)
    centers = [[float(10 * (c + 1)) * ((d % k == c) + 0.1) for d in range(dim)] for c in range(k)]
    rows = []
    i = 0
    for c, ctr in enumerate(centers):
        for _ in range(per):
            rows.append(
                (i, [x + rng.uniform(-spread, spread) for x in ctr])
            )
            i += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        centers,
    )


def test_parallel_seed_recovers_planted_clusters(spark):
    import math

    from amanogawa_spark.operators.kmeans import kmeans_centroids

    df, centers = _planted(spark)
    got = kmeans_centroids(df, k=4, max_iter=8, init="parallel")
    cents = [list(r["cv"]) for r in got.collect()]
    assert len(cents) == 4
    # every planted center has a recovered centroid close to it
    for ctr in centers:
        best = min(
            math.dist(ctr, cv) for cv in cents
        )
        assert best < 1.0, (ctr, best)


def test_parallel_seed_deterministic_and_invariant(spark):
    from amanogawa_spark.operators.kmeans import parallel_seed_centroids
    from pyspark.sql import functions as F

    df, _ = _planted(spark, k=3, per=20)
    v = df.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = parallel_seed_centroids(v, k=3, rounds=2)
    b = parallel_seed_centroids(v.repartition(9), k=3, rounds=2)
    assert a == b


def test_parallel_seed_guards(spark):
    from pyspark.sql import functions as F

    from amanogawa_spark.operators.kmeans import parallel_seed_centroids

    empty = spark.createDataFrame([], "id long, v array<double>")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parallel_seed_centroids(empty, k=2)
    # two identical points: phi hits 0, candidates < k -> loud error
    two = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0])], "id long, v array<double>"
    )
    with _pytest.raises(ValueError):
        parallel_seed_centroids(two, k=3)
