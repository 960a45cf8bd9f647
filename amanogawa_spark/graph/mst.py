"""Minimum spanning forest (Borůvka) and single-linkage clustering.

Why a web/training-data engine wants this: near-dup candidate pairs
(MinHash verify, ``embedding_neardup``) carry a distance; the minimum
spanning forest over that pair graph IS the single-linkage dendrogram —
cutting the forest at threshold t yields exactly the connected
components of the t-filtered pair graph, for EVERY t, without re-running
the pair generation. One MSF pass replaces a sweep of per-threshold
clusterings (duplicate-cluster sensitivity analysis, hierarchical
near-dup grouping).

Algorithm — Borůvka, the parallel-native MST (Kruskal/Prim are
inherently sequential): each round every component picks its minimum
outgoing edge under a STRICT total order (weight, a, b); picked edges
join the forest; touched components contract. The edge order being
total makes the forest unique — independent of partitioning, round
schedule, or engine — so the DuckDB oracle and a driver-side Kruskal
agree edge-for-edge even with duplicate weights.

Scale shape per round (O(log V) rounds):

- annotate both endpoints with current labels: two hash joins on the
  working edge set, which SHRINKS every round (intra-component edges are
  dropped and the survivor set persisted);
- per-component argmin: one map-side-combined ``F.min(struct(...))``
  aggregate — no window, no driver state;
- contraction: connected components over the picked edge set in
  COMPONENT space (≤ one edge per component, geometrically shrinking) —
  converged small-star/large-star on the default path, fixed-round
  min-label on the oracle-mirror path;
- relabel: one join against the O(components) mapping.

Nothing larger than O(components) is aggregated; no collect touches
anything O(E). Lineage is truncated every round with an eager
``localCheckpoint`` (the pagerank pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _canonical_weighted(edges: DataFrame, weight_col: str) -> DataFrame:
    """(a, b, w) with a < b, parallel edges collapsed to their min weight
    (the only one an MST could use), self-loops dropped."""
    return (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def minimum_spanning_forest(
    vertices: DataFrame,
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 30,
    fixed_rounds: int | None = None,
    contract_fixed_rounds: int | None = None,
) -> DataFrame:
    """(a, b, weight) — the minimum spanning forest under the strict edge
    order (weight, a, b).

    ``fixed_rounds``: run exactly that many Borůvka rounds with NO
    convergence action (the SQL-oracle variant; partial forest if the
    graph needs more rounds). ``contract_fixed_rounds``: bound the
    per-round contraction at that many min-label rounds instead of
    converged small-star CC (again the oracle variant — both engines
    then execute the identical bounded schedule).
    """
    from amanogawa_spark.graph.components import (
        connected_components,
        connected_components_minlabel,
    )

    work = _canonical_weighted(edges, weight_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    labels = vertices.select("id", F.col("id").alias("comp"))
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    forest_parts: list[DataFrame] = []
    pending = [work]
    for _ in range(rounds):
        la = labels.select(F.col("id").alias("a"), F.col("comp").alias("ca"))
        lb = labels.select(F.col("id").alias("b"), F.col("comp").alias("cb"))
        cross = (
            work.join(la, "a")
            .join(lb, "b")
            .filter(F.col("ca") != F.col("cb"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if fixed_rounds is None and cross.limit(1).count() == 0:
            cross.unpersist()
            break
        # per-component minimum outgoing edge under the total order
        # (w, a, b): struct-min is lexicographic, so ties are broken
        # identically on every engine and partitioning
        pick_struct = F.struct(
            F.col("w"), F.col("a"), F.col("b"), F.col("ca"), F.col("cb")
        ).alias("e")
        picks = (
            cross.select(F.col("ca").alias("comp"), pick_struct)
            .unionAll(cross.select(F.col("cb").alias("comp"), pick_struct))
            .groupBy("comp")
            .agg(F.min("e").alias("e"))
            .select("e.w", "e.a", "e.b", "e.ca", "e.cb")
            .distinct()
            .localCheckpoint(eager=True)
        )
        forest_parts.append(picks.select("a", "b", "w"))
        # contract in component space: new label = min label reachable
        # through this round's picked edges
        cuniv = (
            picks.select(F.col("ca").alias("id"))
            .unionAll(picks.select(F.col("cb").alias("id")))
            .distinct()
        )
        cedges = picks.select(
            F.col("ca").alias("src_id"), F.col("cb").alias("dst_id")
        )
        if contract_fixed_rounds is None:
            mapping = connected_components(cuniv, cedges)
        else:
            mapping = connected_components_minlabel(
                cuniv, cedges, fixed_rounds=contract_fixed_rounds
            )
        mapping = mapping.select(
            F.col("id").alias("comp"), F.col("component").alias("nc")
        )
        labels = (
            labels.join(F.broadcast(mapping), "comp", "left")
            .select("id", F.coalesce("nc", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        nxt = (
            cross.select("a", "b", "w")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        nxt.count()
        for p in pending + [cross]:
            p.unpersist()
        pending = [nxt]
        work = nxt
    for p in pending:
        p.unpersist()
    if not forest_parts:
        spark = vertices.sparkSession
        return spark.createDataFrame([], "a long, b long, weight double")
    out = forest_parts[0]
    for part in forest_parts[1:]:
        out = out.unionAll(part)
    # a pick can be selected by both endpoints in one round (dedup inside
    # the round); across rounds its endpoints share a component, so it
    # can never be re-picked — distinct is belt-and-braces only
    return out.distinct().select(
        "a", "b", F.col("w").alias("weight")
    )


def single_linkage_clusters(
    vertices: DataFrame,
    forest: DataFrame,
    threshold: float,
) -> DataFrame:
    """(id, cluster) — single-linkage clusters at distance ``threshold``:
    connected components of the forest edges with weight <= threshold.
    Feeding the MSF instead of the raw pair graph gives identical
    clusters (single-linkage property) over V-1 edges instead of E."""
    from amanogawa_spark.graph.components import connected_components

    kept = forest.filter(F.col("weight") <= F.lit(float(threshold))).select(
        F.col("a").alias("src_id"), F.col("b").alias("dst_id")
    )
    cc = connected_components(vertices, kept)
    return cc.select("id", F.col("component").alias("cluster"))
