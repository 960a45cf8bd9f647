"""Crawl-over-crawl graph diffs: what changed between two snapshots.

The incremental pipeline's reporting half (the warm-start PageRank /
incremental-CC operators consume deltas; this module *produces* them):
given the edge tables of two crawls, emit added/removed edges, per-vertex
degree deltas, and a one-row summary — the health report a recrawl job
publishes before deciding whether to re-converge ranks from the warm
vector or from scratch.

Scale: one marker-union + ONE map-side-combined groupBy on the edge key —
never a join of the two snapshots (a full-outer join would shuffle both
sides too, but the union-count formulation also collapses the
added/removed/unchanged classification into a single aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_diff(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """(src_id, dst_id, change): 'added' | 'removed', distinct-edge semantics.

    Unchanged edges are omitted (they are the overwhelming majority on a
    recrawl — emitting them would make the diff as big as the crawl).
    """
    o = old_edges.select("src_id", "dst_id").distinct().withColumn("m", F.lit(-1))
    n = new_edges.select("src_id", "dst_id").distinct().withColumn("m", F.lit(1))
    return (
        o.unionByName(n)
        .groupBy("src_id", "dst_id")
        .agg(F.sum("m").alias("s"))
        .filter(F.col("s") != 0)
        .select(
            "src_id",
            "dst_id",
            F.when(F.col("s") > 0, F.lit("added")).otherwise(F.lit("removed")).alias("change"),
        )
    )


def degree_deltas(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """(id, out_delta, in_delta) for vertices whose degree changed.

    Derived from the edge diff, so it is |diff|-sized work, not
    |snapshot|-sized."""
    d = edge_diff(old_edges, new_edges).withColumn(
        "w", F.when(F.col("change") == "added", F.lit(1)).otherwise(F.lit(-1))
    )
    out_d = d.groupBy(F.col("src_id").alias("id")).agg(F.sum("w").alias("out_delta"))
    in_d = d.groupBy(F.col("dst_id").alias("id")).agg(F.sum("w").alias("in_delta"))
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_delta", F.lit(0)).alias("out_delta"),
            F.coalesce("in_delta", F.lit(0)).alias("in_delta"),
        )
        .filter((F.col("out_delta") != 0) | (F.col("in_delta") != 0))
    )


def diff_summary(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """One row: (n_added, n_removed, n_unchanged, churn_r) where churn =
    (added + removed) / max(1, |new|) rounded to 8 — the scalar a recrawl
    job logs to its metrics journal."""
    o = old_edges.select("src_id", "dst_id").distinct().withColumn("m", F.lit(-1))
    n = new_edges.select("src_id", "dst_id").distinct().withColumn("m", F.lit(1))
    per_edge = (
        o.unionByName(n)
        .groupBy("src_id", "dst_id")
        .agg(F.sum("m").alias("s"), F.count("*").alias("c"))
    )
    return per_edge.agg(
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).cast("long").alias("n_added"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).cast("long").alias("n_removed"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("n_unchanged"),
    ).select(
        "n_added",
        "n_removed",
        "n_unchanged",
        F.round(
            (F.col("n_added") + F.col("n_removed"))
            / F.greatest(F.lit(1).cast("long"), F.col("n_added") + F.col("n_unchanged")),
            8,
        ).alias("churn_r"),
    )
