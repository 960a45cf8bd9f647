"""Distance-based centrality: exact truncated harmonic (verify path).

Harmonic centrality H(u) = Σ_{v ≠ u} 1/d(u, v) over directed shortest
paths. The exact all-pairs form materializes O(V·ball) pairs, so this
module truncates at a small radius (the mass beyond 3-4 hops is tiny on
small-diameter web graphs) and serves as the CORRECTNESS baseline; the
100 TB path is :mod:`amanogawa_spark.graph.hyperball`, which estimates
the same neighborhood function in O(V·2^p) state with HLL registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def truncated_harmonic(
    vertices: DataFrame,
    edges: DataFrame,
    radius: int = 3,
) -> DataFrame:
    """(id, harmonic) — Σ 1/d(u,v) over v reachable from u within ``radius``.

    Frontier BFS over DataFrame joins: round r expands only the pairs
    first reached at distance r−1 (not the whole distance table), so
    per-round work is |frontier ⋈ edges|; a min-aggregate after each
    expansion keeps shortest distances exact. Vertices reaching nothing
    get harmonic = 0.0.
    """
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
    )
    dist = (
        e.select(F.col("src_id").alias("u"), F.col("dst_id").alias("v"))
        .withColumn("d", F.lit(1))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = dist
    for r in range(2, radius + 1):
        expanded = (
            frontier.join(
                e.select(F.col("src_id").alias("v"), F.col("dst_id").alias("v2")),
                "v",
            )
            .select("u", F.col("v2").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .withColumn("d", F.lit(r))
        )
        merged = (
            dist.unionAll(expanded)
            .groupBy("u", "v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # next frontier: pairs whose shortest distance IS r (newly reached)
        frontier = merged.filter(F.col("d") == r)
        dist.unpersist()
        dist = merged
    h = dist.groupBy("u").agg(F.sum(F.lit(1.0) / F.col("d")).alias("harmonic"))
    out = (
        vertices.select("id")
        .join(h.select(F.col("u").alias("id"), "harmonic"), "id", "left")
        .select("id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"))
    )
    return out
