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
