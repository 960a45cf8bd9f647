"""HITS (hubs and authorities) over the directed edge table.

Kleinberg's algorithm: authority(v) = sum of hub scores pointing at v;
hub(u) = sum of authority scores u points at; normalize each vector per
iteration. L1 normalization (sum = 1) rather than L2 — same fixed-point
ranking, but the per-iteration scalar is a plain SUM, which keeps the
DuckDB oracle an exact unrolled-CTE mirror (an L2 norm's sqrt would
introduce a second association order to match).

Execution shape mirrors pagerank.py: edges hash-partitioned + persisted
once; per iteration two join+agg passes (auth from hubs, hubs from auth)
and ONE driver action collecting the normalizing sums AND the L1 delta of
the *previous* transition (the scores frame carries last iteration's
values as extra columns, so the delta needs no second pass — convergence
is checked one iteration late, costing at most one extra iteration but
halving driver barriers); lineage truncated every 2 iterations.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class HitsResult:
    scores: DataFrame  # (id long, hub double, authority double)
    iterations: int
    delta: float
    history: list[dict] = field(default_factory=list)


def hits(
    vertices: DataFrame,
    edges: DataFrame,
    tol: float = 1e-6,
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> HitsResult:
    spark = vertices.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = (
        edges.select("src_id", "dst_id")
        .distinct()
        .repartition(n_part, "src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()
    verts = (
        vertices.select("id").distinct().repartition(n_part, "id").persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    n = verts.count()
    if n == 0:
        empty = verts.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
        return HitsResult(empty, 0, 0.0)

    # scores carries (hub, authority) for iteration k-1 AND (p_hub, p_auth)
    # for k-2, so the per-iteration stats aggregate can compute the k-2→k-1
    # L1 delta without a second driver action.
    scores = verts.select(
        "id",
        F.lit(1.0 / n).alias("hub"),
        F.lit(1.0 / n).alias("authority"),
        F.lit(1.0 / n).alias("p_hub"),
        F.lit(1.0 / n).alias("p_auth"),
    ).localCheckpoint(eager=True)

    history: list[dict] = []
    delta = float("inf")
    it = 0
    prev_cached = None
    while it < max_iter and delta > tol:
        t0 = time.time()
        it += 1
        # authority' (unnormalized) = sum of in-neighbor hub scores
        auth_raw = (
            e.join(
                scores.select(F.col("id").alias("src_id"), "hub").hint(
                    "shuffle_hash"
                ),
                "src_id",
            )
            .groupBy(F.col("dst_id").alias("id"))
            .agg(F.sum("hub").alias("auth_raw"))
        )
        # hub' (unnormalized) = sum of out-neighbor NEW authorities — the
        # classic two-phase update within one iteration
        hub_raw = (
            e.join(
                auth_raw.select(F.col("id").alias("dst_id"), "auth_raw").hint(
                    "shuffle_hash"
                ),
                "dst_id",
            )
            .groupBy(F.col("src_id").alias("id"))
            .agg(F.sum("auth_raw").alias("hub_raw"))
        )
        joined = (
            verts.join(auth_raw.hint("shuffle_hash"), "id", "left")
            .join(hub_raw.hint("shuffle_hash"), "id", "left")
            .join(
                scores.select(
                    "id",
                    F.col("hub").alias("old_hub"),
                    F.col("authority").alias("old_auth"),
                    "p_hub",
                    "p_auth",
                ).hint("shuffle_hash"),
                "id",
            )
            .select(
                "id",
                F.coalesce("auth_raw", F.lit(0.0)).alias("auth_raw"),
                F.coalesce("hub_raw", F.lit(0.0)).alias("hub_raw"),
                "old_hub",
                "old_auth",
                "p_hub",
                "p_auth",
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # THE one driver action: normalizing sums for iteration k plus the
        # L1 delta of the k-2 → k-1 transition (both score generations ride
        # along in the scores frame, so no second pass is needed).
        stats = joined.agg(
            F.sum("auth_raw").alias("sa"),
            F.sum("hub_raw").alias("sh"),
            F.sum(
                F.abs(F.col("old_hub") - F.col("p_hub"))
                + F.abs(F.col("old_auth") - F.col("p_auth"))
            ).alias("dprev"),
        ).collect()[0]
        sa = stats["sa"] or 1.0
        sh = stats["sh"] or 1.0
        if it >= 2:  # it==1's dprev compares the duplicated init vector (0.0)
            delta = stats["dprev"] or 0.0
        scores = joined.select(
            "id",
            (F.col("hub_raw") / F.lit(sh)).alias("hub"),
            (F.col("auth_raw") / F.lit(sa)).alias("authority"),
            F.col("old_hub").alias("p_hub"),
            F.col("old_auth").alias("p_auth"),
        )
        if it % 2 == 0:
            scores = scores.localCheckpoint(eager=False)
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = joined
        history.append(
            {
                "iteration": it,
                "l1_delta_prev": float(stats["dprev"] or 0.0),
                "seconds": time.time() - t0,
            }
        )

    scores = scores.select("id", "hub", "authority").localCheckpoint(eager=True)
    if prev_cached is not None:
        prev_cached.unpersist()
    e.unpersist()
    verts.unpersist()
    return HitsResult(scores=scores, iterations=it, delta=float(delta), history=history)


def hits_fixed_iterations(
    vertices: DataFrame, edges: DataFrame, iterations: int
) -> DataFrame:
    """Exactly-k-iteration HITS — the SQL-oracle variant."""
    return hits(vertices, edges, tol=-1.0, max_iter=iterations).scores
