"""Distributed Lloyd's k-means over an embedding column — the centroid
feeder for IVF ANN (:func:`amanogawa_spark.operators.similarity.ivf_topk`).

Execution shape per iteration (all built-in ops):

- **assignment**: the k×dim centroid matrix is tiny, so it ships as plan
  LITERALS (cheaper than even a broadcast join — zero join, pure
  projection); cid = argmin of k squared-distance expressions, ties to the
  lowest cid.
- **update**: ``posexplode`` the vectors to (cid, pos, val) and ONE hash
  aggregate with map-side partial combine — the shuffle carries only
  ``partitions × k × dim`` partial sums, not the n×dim exploded rows.
- **driver**: collects k×dim means per iteration (a few KB) and the max
  centroid shift for the stop rule. One collect per iteration.

Determinism: init picks the k hash-smallest ids (seeded xxhash64 ranking —
no RNG state, stable under repartitioning); every later step is a pure
function of the previous centroids with deterministic tie-breaks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_cid(vec, centroids: list[list[float]]):
    """argmin_c ||v - c||² as a Catalyst expression; ties → lowest cid."""
    dists = []
    for c in centroids:
        lit_c = F.array(*[F.lit(x) for x in c])
        d = F.aggregate(
            F.zip_with(vec, lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        dists.append(d)
    arr = F.array(*dists)
    # array_position returns the FIRST index of the min → lowest cid on ties
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def seed_vectors(v: DataFrame, k: int, seed: int) -> DataFrame:
    """(id, v, _h): the k hash-smallest rows — deterministic k-means init.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — each
    partition keeps a local top-k of (hash, id) longs and the driver
    merges k rows per partition; NO single-partition Exchange anywhere in
    the plan (a global ``Window.orderBy`` would funnel every id through
    one task — at 10^12 vectors that one stage kills the job; plan-pinned
    by test_kmeans_seeding). The k seed vectors come back via a broadcast
    join on the k ids, so the wide vector column never enters the ranking.
    """
    seed_ids = (
        v.select("id", F.xxhash64("id", F.lit(seed)).alias("_h"))
        .orderBy(F.asc("_h"), F.asc("id"))
        .limit(k)
    )
    return v.join(F.broadcast(seed_ids), "id").select("id", "v", "_h")


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 10,
    tol: float = 1e-6,
    seed: int = 0,
    init: str = "hash",
) -> DataFrame:
    """(cid int, cv array<double>) — Lloyd's k-means centroids.

    Empty clusters keep their previous centroid (standard Lloyd fallback).
    Stops when the max centroid L2 shift <= tol or after max_iter.

    ``init``: 'hash' (default — seeded xxhash64-smallest rows) or
    'min_id' (the k id-smallest rows; hash-free, so an external SQL
    engine can reproduce the whole training run — the value-oracle
    path).  Both compile to TakeOrderedAndProject, no global window.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if init == "min_id":
        init_rows = (
            v.orderBy(F.asc("id")).limit(k).select("id", "v", F.col("id").alias("_h"))
        ).collect()
    elif init == "hash":
        init_rows = seed_vectors(v, k, seed).collect()
    else:
        raise ValueError(f"unknown init mode: {init!r}")
    centroids = [
        list(r["v"]) for r in sorted(init_rows, key=lambda r: (r["_h"], r["id"]))
    ][:k]
    if len(centroids) < k:
        raise ValueError(f"need >= {k} rows for k={k} init, got {len(centroids)}")

    for _ in range(max_iter):
        assigned = v.select("id", "v", _assign_cid(F.col("v"), centroids).alias("cid"))
        stats = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, tuple[float, int]]] = {}
        for r in stats:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = (r["s"], r["n"])
        shift = 0.0
        new_centroids = []
        for cid, old in enumerate(centroids):
            dims = by_cid.get(cid)
            if not dims:  # empty cluster: keep the previous centroid
                new_centroids.append(old)
                continue
            mean = [dims[p][0] / dims[p][1] for p in range(len(old))]
            shift = max(
                shift, math.sqrt(sum((a - b) ** 2 for a, b in zip(mean, old)))
            )
            new_centroids.append(mean)
        centroids = new_centroids
        if shift <= tol:
            break

    spark = df.sparkSession
    return spark.createDataFrame(
        [(cid, c) for cid, c in enumerate(centroids)], "cid int, cv array<double>"
    )


def simplified_silhouette(
    v: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """(cluster, n, mean_sil) — simplified silhouette (Hruschka et al.):
    a(i) = distance to the OWN centroid, b(i) = distance to the nearest
    OTHER centroid, s(i) = (b−a)/max(a,b) — the O(n·k) cluster-quality
    score that replaces the O(n²) classic silhouette at corpus scale
    (centroid distances stand in for mean member distances).

    ``centroids``: (cid, c array<double>), broadcast. Assignment ties
    break to the smallest cid. ``round_to`` rounds each point-centroid
    distance before the argmin — the engine-portability hook that makes
    assignments identical across engines/layouts (same contract as
    classifier_train's rounded trajectory).

    Scale: one broadcast cross join (n·k rows, map-only), then two
    map-side-combined struct-min aggregates keyed by point id — no
    window, no shuffle wider than n rows.
    """
    pts = v.select(F.col(id_col).alias("id"), F.col(vec_col).alias("x"))
    cents = F.broadcast(centroids.select("cid", "c"))
    d = F.sqrt(
        F.aggregate(
            F.zip_with("x", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
    )
    if round_to is not None:
        d = F.round(d, round_to)
    pd_ = pts.crossJoin(cents).select("id", "cid", d.alias("d"))
    first = pd_.groupBy("id").agg(F.min(F.struct("d", "cid")).alias("f"))
    sec = (
        pd_.join(first, "id")
        .filter(F.col("cid") != F.col("f.cid"))
        .groupBy("id")
        .agg(F.min("d").alias("b"))
    )
    s = F.when(
        F.greatest(F.col("f.d"), F.col("b")) > 0.0,
        (F.col("b") - F.col("f.d")) / F.greatest(F.col("f.d"), F.col("b")),
    ).otherwise(F.lit(0.0))
    per_pt = first.join(sec, "id").select(
        F.col("f.cid").alias("cluster"), s.alias("s")
    )
    return per_pt.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("s"), 8).alias("mean_sil"),
    )
