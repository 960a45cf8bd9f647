"""Multi-source shortest paths over DataFrame joins (frontier relaxation).

The link-graph engine's distance primitive: BFS hop levels (unweighted)
and Bellman-Ford relaxation (non-negative weighted) from a seed set —
the building block behind crawl-depth audits, seed-proximity features,
and the exact baseline for the HyperBall estimators
(:mod:`amanogawa_spark.graph.hyperball`).

Reference anchor: the reference has no distance operator; this extends
its graph surface (``to_graph`` emits only the edge table,
``plugin/flow/to_graph/to_graph.cpp:174-186``) the way PageRank/CC/LPA
do, per the north rule.

Scale design (10^12 edges):

- State is ``(id, source, dist)`` — O(sources × reached), NOT O(V × V);
  callers pick the seed set, the frontier only carries rows whose
  distance improved last round, and settled rows never re-join edges.
- Per round: ONE shuffle of the frontier against the (cached,
  hash-partitioned) adjacency + a map-side-combined min-aggregate of
  candidates + a min-merge into the distance table. No whole-table
  re-expansion (the candidate aggregate happens BEFORE touching the
  big distance state).
- One driver action per round (the improved-count convergence scalar);
  lineage truncated with ``localCheckpoint`` every round, AQE scoped
  off like the PageRank loop (fixed plan, see ``iter_conf.py``).
- Unweighted runs settle in graph-diameter rounds (web graphs: ~20);
  weighted runs are exact once no distance improves, and after ``r``
  rounds the partial result is exactly "min over paths of ≤ r edges" —
  the contract the bounded-round DuckDB oracle mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.graph.iter_conf import iteration_conf


def shortest_paths(
    edges: DataFrame,
    sources: list[int],
    weight: Column | str | None = None,
    max_rounds: int = 64,
    adaptive: bool = False,
) -> DataFrame:
    """(source, id, dist) — shortest distance from each seed to each
    reached vertex (seeds included at dist 0). Unreached pairs are absent.

    ``weight``: None → hop counts (long); column/expr → summed weights
    (double, must be non-negative — negative weights would need the full
    |V|-1 rounds AND a negative-cycle check; this loop stops early when
    settled, which is only correct for Dijkstra-style inputs).
    """
    spark = edges.sparkSession
    w = (
        F.lit(1).cast("long")
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    )
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id", w.alias("w"))
        .groupBy("src_id", "dst_id")
        .agg(F.min("w").alias("w"))  # parallel edges: keep the cheapest
        .repartition("src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    zero = F.lit(0).cast("long") if weight is None else F.lit(0.0)
    seeds = spark.createDataFrame(
        [(int(s),) for s in sources], "source long"
    ).select("source", F.col("source").alias("id"), zero.alias("dist"))

    dist = seeds.persist(StorageLevel.MEMORY_AND_DISK)
    frontier = dist
    with iteration_conf(spark, disable_aqe=not adaptive):
        for _ in range(max_rounds):
            # candidate dists via the frontier only; aggregate BEFORE merge
            cand = (
                frontier.join(e, frontier["id"] == e["src_id"])
                .select(
                    "source",
                    F.col("dst_id").alias("id"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                )
                .groupBy("source", "id")
                .agg(F.min("dist").alias("dist"))
            )
            improved = (
                cand.join(
                    dist.select("source", "id", F.col("dist").alias("old")),
                    ["source", "id"],
                    "left",
                )
                .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
                .select("source", "id", "dist")
                .localCheckpoint(eager=True)
            )
            if not improved.take(1):
                break
            new_dist = (
                dist.unionByName(improved)
                .groupBy("source", "id")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=False)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_dist.count()
            dist.unpersist()
            dist = new_dist
            frontier = improved
    e.unpersist()
    return dist


def bfs_levels(
    edges: DataFrame, sources: list[int], max_rounds: int = 64
) -> DataFrame:
    """Hop distance (BFS level) from each seed: ``shortest_paths`` with
    unit weights — settles in diameter rounds."""
    return shortest_paths(edges, sources, weight=None, max_rounds=max_rounds)


def ego_network(
    edges: DataFrame,
    sources: list[int],
    hops: int = 2,
    undirected: bool = False,
) -> DataFrame:
    """Induced k-hop ego subgraph around the seeds: the edges whose BOTH
    endpoints lie within ``hops`` BFS levels of some seed, annotated with
    each endpoint's hop distance (minimum over seeds).

    Returns (src_id, dst_id, src_hops, dst_hops). The seed-neighborhood
    extraction every drill-down workflow needs (debug a spam cluster,
    visualize a site's link ecology, build a training subgraph) without
    ever materializing anything bigger than the frontier: BFS work is
    frontier-bounded per round (``shortest_paths``), and the induced-edge
    step is two hash joins of the edge table against the reached set —
    vertices outside the ball never join. ``undirected=True`` explores
    links both ways (the ego ball of the symmetrized graph); the returned
    edges are always the original directed rows.
    """
    e = edges.select("src_id", "dst_id")
    bfs_edges = (
        e.unionAll(e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")))
        if undirected
        else e
    )
    dist = (
        bfs_levels(bfs_edges, sources, max_rounds=hops)
        .groupBy("id")
        .agg(F.min("dist").alias("hops"))
        .filter(F.col("hops") <= hops)
    )
    return (
        e.join(dist.select(F.col("id").alias("src_id"), F.col("hops").alias("src_hops")), "src_id")
        .join(dist.select(F.col("id").alias("dst_id"), F.col("hops").alias("dst_hops")), "dst_id")
        .select("src_id", "dst_id", "src_hops", "dst_hops")
    )
