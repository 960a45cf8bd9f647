"""SemDeDup: semantic deduplication via embedding clusters.

The SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication"): cluster document embeddings
with k-means, then inside each cluster drop all but one member of every
ε-ball of cosine similarity — pairwise comparison happens only WITHIN a
cluster, never across the corpus, which is what makes semantic dedup
tractable at web scale (the within-cluster join is O(Σ|cluster|²), not
O(n²)).

Deterministic keep rule used here: a vector is dropped iff some
*smaller-id* vector in the same cluster has cosine ≥ threshold — the
greedy keep-first-representative sweep, order-stable on every engine and
exactly SQL-expressible for the oracle. (The paper keeps the member with
lowest centroid-similarity per group; that choice changes WHICH
representative survives, not how many — swap the ordering column for it.)

Scale design (100 TB):

- centroid assignment broadcasts the (tiny) centroid table — the corpus
  never shuffles for assignment;
- the pair stage shuffles once on cid, and ``max_cluster_size`` bounds any
  hot cluster's self-join at B² (same guard as ``cosine_topk_lsh`` /
  ``minhash_candidates`` — a giant near-dup cluster is exactly where a
  skew blowup hides, measured at 80M pairs/130 s unguarded in
  BENCH/BASELINE.md §3c);
- the drop set is a distinct projection of the dup pairs; survivors come
  from one left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.operators.similarity import _dot


def _unit_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, v): L2-normalized double vectors — the norm is computed ONCE per
    row into its own column so every later cosine is a single dot product
    (the naive dot/(|a||b|) form re-folds both norms per candidate pair —
    3× the array traffic on the pair stage, measured 88.5 s → 54.4 s on the
    33k-vector bench probe). Requires non-zero vectors."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("raw"),
        )
        .withColumn("nv", F.sqrt(_dot(F.col("raw"), F.col("raw"))))
        .select(
            "id", F.transform("raw", lambda x: x / F.col("nv")).alias("v")
        )
    )


def assign_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    stride: int = 25,
) -> DataFrame:
    """(id, v, cid): nearest-centroid (cosine) assignment over UNIT vectors.

    ``centroids``: (cid, cv array<double>) — feed
    :func:`~amanogawa_spark.operators.kmeans.kmeans_centroids` output for
    trained quality (normalized here). Default: every ``stride``-th id
    (deterministic, SQL-mirrorable). Ties break toward the smaller cid on
    every engine. The returned ``v`` is the normalized vector, so
    downstream cosines are plain dots.
    """
    v = _unit_vectors(df, id_col, vec_col)
    if centroids is not None:
        cents = _unit_vectors(centroids, "cid", "cv").select(
            F.col("id").cast("long").alias("cid"), F.col("v").alias("cv")
        )
        if cents.limit(1).count() == 0:
            raise ValueError("assign_clusters: `centroids` table is empty")
    else:
        cents = v.filter(F.col("id") % stride == 0).select(
            F.col("id").alias("cid"), F.col("v").alias("cv")
        )
        if cents.limit(1).count() == 0:
            # sparse or non-contiguous id space where no id hits the stride:
            # an empty centroid set would silently drop EVERY row through
            # the inner join below. Fall back to the 16 smallest ids
            # (orderBy+limit = TakeOrdered, no single-partition exchange).
            cents = (
                v.orderBy(F.asc("id"))
                .limit(16)
                .select(F.col("id").alias("cid"), F.col("v").alias("cv"))
            )
    scored = v.join(F.broadcast(cents)).select(
        "id", "v", "cid", _dot(F.col("v"), F.col("cv")).alias("csim")
    )
    wc = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cid"))
    return (
        scored.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") == 1)
        .select("id", "v", "cid")
    )


def assign_clusters_arrow(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    stride: int = 25,
    max_centroids: int = 4096,
) -> DataFrame:
    """BLAS fast path for :func:`assign_clusters`: one ``mapInPandas``
    matrix multiply per Arrow batch (X̂ @ Ĉᵀ, argmax row-wise) instead of
    C chained fold expressions per row.

    Same contract (unit ``v`` returned, ties → lowest cid since cids are
    sorted and argmax takes the first maximum), but float sums run
    through numpy's pairwise summation, so assignments can differ from
    the expression path within fp noise of a tie — use the expression
    path where a SQL oracle must mirror bit-for-bit, this one for bulk
    throughput (with the gram-matrix pair stage: 54.4 s → 8.2 s end-to-end
    on the 33k×222 bench shape, zero output mismatches). Map-only: the
    centroid matrix rides in the UDF closure, no shuffle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if centroids is None:
        # BOUNDED derivation: the stride filter alone collects O(n/stride)
        # rows — unbounded at corpus scale. orderBy+limit is TakeOrdered
        # (per-partition local top-k, tiny driver merge), so the driver
        # holds at most max_centroids × dim doubles. For trained-quality
        # clusters pass kmeans_centroids() output explicitly.
        rows = (
            df.filter(F.col(id_col) % stride == 0)
            .select(F.col(id_col).cast("long").alias("cid"), F.col(vec_col).alias("cv"))
            .orderBy(F.asc("cid"))
            .limit(max_centroids)
            .collect()
        )
        if not rows:
            # no id hits the stride (sparse/non-contiguous id space):
            # same fallback as assign_clusters — the 16 smallest ids
            rows = (
                df.select(
                    F.col(id_col).cast("long").alias("cid"),
                    F.col(vec_col).alias("cv"),
                )
                .orderBy(F.asc("cid"))
                .limit(16)
                .collect()
            )
    else:
        rows = centroids.select("cid", "cv").collect()
    if not rows:
        raise ValueError(
            "assign_clusters_arrow: empty centroid set (empty input or empty "
            "`centroids` table) — every row would be dropped downstream"
        )
    rows = sorted(rows, key=lambda r: r["cid"])
    cids = np.array([int(r["cid"]) for r in rows], dtype=np.int64)
    C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in rows])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("cid", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col].values]
            )
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            best = np.argmax(Xn @ Cn.T, axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64").values,
                    "v": list(Xn),
                    "cid": cids[best],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    centroids: DataFrame | None = None,
    stride: int = 25,
    max_cluster_size: int | None = None,
    method: str = "expr",
) -> DataFrame:
    """(id, cid, keep): greedy within-cluster semantic dedup.

    ``keep = false`` iff a smaller-id member of the same cluster sits at
    cosine ≥ ``threshold``. Clusters larger than ``max_cluster_size`` are
    passed through un-deduped (keep = true) rather than joined — the guard
    trades recall inside a pathological cluster for a bounded plan; split
    such clusters with finer centroids instead.

    ``method``: 'expr' (Catalyst folds + pair join — bit-exact vs the SQL
    oracle) or 'arrow' (BLAS batch assignment via
    :func:`assign_clusters_arrow` + one per-cluster gram matrix in
    ``applyInPandas`` — the bulk-throughput path; with the guard bounding
    cluster size B the gram matrix is ≤ B² doubles per group).
    """
    if method == "arrow":
        assigned = assign_clusters_arrow(
            df, id_col=id_col, vec_col=vec_col, centroids=centroids, stride=stride
        )
    else:
        assigned = assign_clusters(
            df, id_col=id_col, vec_col=vec_col, centroids=centroids, stride=stride
        )
    if max_cluster_size is not None:
        sizes = assigned.groupBy("cid").agg(F.count("*").alias("_sz"))
        assigned = assigned.join(sizes, "cid")
        joinable = assigned.filter(F.col("_sz") <= max_cluster_size).drop("_sz")
        passthrough = assigned.filter(F.col("_sz") > max_cluster_size).drop("_sz")
    else:
        joinable = assigned
        passthrough = None

    if method == "arrow":
        out = _cluster_dedup_arrow(joinable, threshold)
    else:
        a = joinable.select("cid", F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = joinable.select("cid", F.col("id").alias("id_b"), F.col("v").alias("vb"))
        dup_ids = (
            a.join(b, "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            # vectors are pre-normalized: cosine is one dot, not dot/(|a||b|)
            .filter(_dot(F.col("va"), F.col("vb")) >= threshold)
            .select(F.col("id_b").alias("id"))
            .distinct()
        )
        out = (
            joinable.join(dup_ids.withColumn("_dup", F.lit(1)), "id", "left")
            .select("id", "cid", F.col("_dup").isNull().alias("keep"))
        )
    if passthrough is not None:
        out = out.unionByName(
            passthrough.select("id", "cid", F.lit(True).alias("keep"))
        )
    return out


def _cluster_dedup_arrow(joinable: DataFrame, threshold: float) -> DataFrame:
    """Per-cluster greedy sweep as ONE gram matrix per group: keep[j] =
    no i<j (by id) with X̂X̂ᵀ[i,j] ≥ threshold. One shuffle on cid; memory
    per group is |cluster|² doubles — bounded by the max_cluster_size
    guard upstream."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("keep", T.BooleanType()),
        ]
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("id")
        X = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"].values])
        mask = (X @ X.T) >= threshold
        dup = np.triu(mask, 1).any(axis=0)
        return pd.DataFrame(
            {
                "id": pdf["id"].astype("int64").values,
                "cid": pdf["cid"].astype("int64").values,
                "keep": ~dup,
            }
        )

    return joinable.select("id", "cid", "v").groupBy("cid").applyInPandas(fn, schema)
