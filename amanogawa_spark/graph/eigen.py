"""Eigenvector centrality and truncated hitting time as fixed-point joins.

Eigenvector centrality is the PageRank family member the engine was
still missing (reference parity anchor: the reference's PageRank plugin
`src/amanogawa/plugin/flow/to_graph/` stops at damped PageRank; the
undamped principal-eigenvector variant is the textbook complement):
x ← A^T x / ||A^T x||_1, power-iterated. Per iteration the plan is ONE
edge-sized shuffle (groupBy dst with map-side partial sums) plus a
1-row broadcast of the L1 norm — the normalizer never round-trips
through the driver, so the loop is a pure Spark DAG and the same plan
shape holds at 10^12 edges.

Truncated hitting time (Sarkar & Moore, "A tractable approach to
finding closest truncated-commute-time neighbors in large graphs",
UAI 2007) is the crawl-frontier dual: expected random-walk steps to
reach a target page set, capped at horizon K. Backward value
iteration: h_k(v) = 0 for targets, else 1 + avg over out-neighbors of
h_{k-1}; a dangling non-target sits at the cap k. Each round is one
edge join + one aggregate; state is O(V).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def eigenvector_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
) -> DataFrame:
    """(id, eig) — L1-normalized power iteration of the in-link operator.

    Exactly ``iterations`` rounds from the uniform vector (the
    oracle-friendly fixed-k form; convergence-tested callers wrap it).
    Vertices with no in-links decay to 0 — the standard directed-graph
    behavior. The L1 total enters the plan as a broadcast 1-row frame,
    not a driver scalar, so no action runs inside the loop.
    """
    spark = vertices.sparkSession
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = vertices.count()
    x = vertices.select("id", (F.lit(1.0) / F.lit(float(n))).alias("x"))
    for it in range(iterations):
        raw = (
            e.join(x.select(F.col("id").alias("src_id"), "x"), "src_id")
            .groupBy(F.col("dst_id").alias("id"))
            .agg(F.sum("x").alias("raw"))
        )
        tot = raw.agg(F.sum("raw").alias("t"))
        x = (
            vertices.select("id")
            .join(raw, "id", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "id",
                (F.coalesce("raw", F.lit(0.0)) / F.col("t")).alias("x"),
            )
        )
        # truncate lineage every few rounds — same cadence as pagerank's
        # chunked path; eager=False folds the checkpoint into the next job
        if (it + 1) % 4 == 0 and it + 1 < iterations:
            x = x.localCheckpoint(eager=False)
    out = x.select("id", F.col("x").alias("eig"))
    e.unpersist()
    return out


def truncated_hitting_time(
    vertices: DataFrame,
    edges: DataFrame,
    targets: DataFrame,
    horizon: int = 4,
) -> DataFrame:
    """(id, hitting) — expected steps to reach ``targets`` within ``horizon``.

    ``targets``: single-column frame of target vertex ids. Backward
    value iteration over out-edges; a walk that cannot reach a target
    within the horizon contributes the cap, so ``hitting == horizon``
    marks "effectively unreachable" — the crawl-scheduling signal
    (pages far from any seed in click distance). Per round: one
    edge ⋈ h join + one per-src average; the target set enters as a
    broadcast semi-join flag, never a driver lookup.
    """
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t = targets.select(F.col(targets.columns[0]).alias("id")).distinct()
    base = vertices.select("id").join(
        t.withColumn("is_t", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("is_t", F.lit(False)).alias("is_t"))
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    # h_0: 0 everywhere (no steps taken yet)
    h = base.select("id", F.lit(0.0).alias("h"))
    for k in range(1, horizon + 1):
        succ = (
            e.join(h.select(F.col("id").alias("dst_id"), "h"), "dst_id")
            .groupBy(F.col("src_id").alias("id"))
            .agg(F.avg("h").alias("avg_h"))
        )
        h = (
            base.join(succ, "id", "left")
            .select(
                "id",
                F.when(F.col("is_t"), F.lit(0.0))
                .otherwise(
                    F.lit(1.0) + F.coalesce("avg_h", F.lit(float(k - 1)))
                )
                .alias("h"),
            )
        )
        if k % 4 == 0 and k < horizon:
            h = h.localCheckpoint(eager=False)
    out = h.select("id", F.col("h").alias("hitting"))
    e.unpersist()
    base.unpersist()
    return out
