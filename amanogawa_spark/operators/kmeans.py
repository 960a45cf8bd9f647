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

    ``init``: 'hash' (default — seeded xxhash64-smallest rows),
    'min_id' (the k id-smallest rows; hash-free, so an external SQL
    engine can reproduce the whole training run — the value-oracle
    path), or 'parallel' (k-means|| oversampling,
    :func:`parallel_seed_centroids` — d²-weighted candidates, the
    quality init at scale). The row-pick inits compile to
    TakeOrderedAndProject, no global window.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if init == "parallel":
        centroids = parallel_seed_centroids(v, k)
    else:
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


def _min_d2_expr(vec, centroids: list[list[float]], round_to: int | None = None):
    """min_c ||v − c||² over literal centroids — sequential-fold per dim
    (matches an external engine's list fold), optionally rounded for
    engine-portable thresholds."""
    dists = []
    for c in centroids:
        lit_c = F.array(*[F.lit(x) for x in c])
        d = F.aggregate(
            F.zip_with(vec, lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        dists.append(d)
    out = F.least(*dists) if len(dists) > 1 else dists[0]
    return F.round(out, round_to) if round_to is not None else out


def parallel_seed_centroids(
    v: DataFrame,
    k: int,
    rounds: int = 3,
    oversample: int | None = None,
    local_iters: int = 5,
    round_to: int = 8,
) -> list[list[float]]:
    """k-means|| initialization (Bahmani et al., VLDB'12) — the published
    scale answer to k-means++'s sequential seeding: instead of k
    dependent driver round-trips, ``rounds`` (≈ O(log φ), 3–5 suffices)
    passes each sample ~``oversample`` (default 2k) points INDEPENDENTLY
    with probability min(1, l·d²(x,C)/φ), then the small weighted
    candidate set is reduced to k centroids by a driver-local weighted
    Lloyd.

    Deterministic and engine-portable: the start candidate is the min-id
    row, the per-round coin is md5(id~round)/2³², and d²/φ/thresholds
    round to ``round_to``/6 decimals — so reruns, repartitionings, and
    the DuckDB oracle (q_kmeanspp_round1 mirrors round one) agree
    exactly. Per round: one map-only scoring pass over the vectors
    (candidate literals in-plan), a 1-row φ collect, and an O(l)
    candidate collect — the corpus never reshuffles. The final weighted
    Lloyd touches only the O(l·rounds) candidates.
    """
    l = oversample or 2 * k
    first = v.orderBy(F.asc("id")).limit(1).collect()
    if not first:
        raise ValueError("parallel_seed_centroids: empty input")
    cands: list[list[float]] = [list(first[0]["v"])]
    for r in range(rounds):
        scored = v.select(
            "id", "v", _min_d2_expr(F.col("v"), cands, round_to).alias("d2")
        )
        phi = scored.agg(F.round(F.sum("d2"), 6).alias("s")).collect()[0]["s"]
        if not phi or phi <= 0.0:
            break
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "~", F.col("id").cast("string"), F.lit(str(r))
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 32))
        )
        thresh = F.round(F.lit(float(l)) * F.col("d2") / F.lit(float(phi)), round_to)
        picked = scored.filter(u < thresh).orderBy("id").select("v").collect()
        cands.extend(list(row["v"]) for row in picked)
    assigned = v.select(_assign_cid(F.col("v"), cands).alias("cid"))
    wts = {
        r["cid"]: r["n"]
        for r in assigned.groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    import numpy as np

    C = np.array(cands, dtype=np.float64)
    w = np.array([wts.get(i, 0) for i in range(len(cands))], dtype=np.float64)
    if len(cands) < k:
        raise ValueError(
            f"k-means|| produced {len(cands)} candidates < k={k}; raise "
            f"oversample/rounds"
        )
    # local init: deterministic weighted farthest-point (the k-means++
    # shape the paper prescribes for the reduce step — picking the k
    # heaviest candidates alone can drop a whole cluster when two heavy
    # candidates land in the same one)
    chosen = [max(range(len(cands)), key=lambda i: (w[i], -i))]
    while len(chosen) < k:
        d2c = ((C[:, None, :] - C[chosen][None, :, :]) ** 2).sum(-1).min(1)
        gain = w * d2c
        nxt = max(range(len(cands)), key=lambda i: (gain[i], -i))
        chosen.append(nxt)
    cent = C[chosen].copy()
    for _ in range(local_iters):
        d = ((C[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            m = (a == j) & (w > 0)
            if m.any():
                cent[j] = (C[m] * w[m, None]).sum(0) / w[m].sum()
    return [[float(x) for x in c] for c in cent]
