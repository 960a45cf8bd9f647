"""Attack-robustness probes: how the web graph degrades under hub removal.

Targeted-attack percolation is the standard structural-robustness
measurement for scale-free graphs (Albert/Jeong/Barabási): remove the
k highest-degree vertices and re-measure the giant weakly-connected
component.  On crawl graphs it answers operational questions — how much
of the reachable web hinges on a handful of portal/hub hosts, and how
fragile frontier connectivity is to blocking them.

Reference scope: engine addition — the reference computes neither
components nor degree rankings (its to_graph plugin only emits edges).

Spark shape at 100 TB:
- Hub selection is a TakeOrderedAndProject over the degree aggregate
  (parallel partial top-k; no global sort, no collect).
- Knockout is two broadcast-able anti-joins (k rows against the edge
  table).
- Components run on both graphs via the existing min-label kernel
  (one edge shuffle per round); the giant-size reduction is two
  O(#components) aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.graph.components import connected_components_minlabel

__all__ = ["top_hubs", "hub_knockout"]


def top_hubs(edges: DataFrame, k: int = 20) -> DataFrame:
    """(id, degree) — the k total-degree (in+out) hubs, ties to the
    smaller id.  Compiles to TakeOrderedAndProject: per-partition
    partial top-k, never a single-partition sort."""
    deg = (
        edges.select(F.col("src_id").alias("id"))
        .unionAll(edges.select(F.col("dst_id").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    return deg.orderBy(F.col("degree").desc(), F.col("id").asc()).limit(k)


def _giant(cc: DataFrame) -> DataFrame:
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .agg(F.max("sz").cast("long").alias("giant"))
    )


def hub_knockout(
    vertices: DataFrame,
    edges: DataFrame,
    k: int = 20,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """One row: (k_removed, n_vertices, giant_before, giant_after,
    retained_frac) — giant weakly-connected-component size before and
    after deleting the ``k`` highest-degree vertices.

    ``fixed_rounds`` pins the min-label component rounds (the
    SQL-oracle variant); ``None`` runs each to convergence.
    ``retained_frac`` = giant_after / giant_before — the headline
    targeted-attack robustness number.
    """
    hubs = top_hubs(edges, k).select("id")
    e2 = edges.join(
        F.broadcast(hubs.withColumnRenamed("id", "src_id")), "src_id", "left_anti"
    ).join(
        F.broadcast(hubs.withColumnRenamed("id", "dst_id")), "dst_id", "left_anti"
    )
    v2 = vertices.join(F.broadcast(hubs), "id", "left_anti")
    cc1 = connected_components_minlabel(vertices, edges, fixed_rounds=fixed_rounds)
    cc2 = connected_components_minlabel(v2, e2, fixed_rounds=fixed_rounds)
    before = _giant(cc1).withColumnRenamed("giant", "giant_before")
    after = _giant(cc2).withColumnRenamed("giant", "giant_after")
    n = vertices.agg(F.count("*").cast("long").alias("n_vertices"))
    return (
        n.crossJoin(before)
        .crossJoin(after)
        .select(
            F.lit(k).cast("long").alias("k_removed"),
            "n_vertices",
            "giant_before",
            "giant_after",
            F.round(
                F.col("giant_after") / F.col("giant_before").cast("double"), 8
            ).alias("retained_frac"),
        )
    )
