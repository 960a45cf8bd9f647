"""Graph sparsification — bounded out-degree for downstream analytics.

A 10^12-page link graph carries hub pages with 10^5+ out-links
(directories, sitemaps, link farms); most link-graph analytics tolerate
— or prefer — a bounded out-neighbourhood (PageRank's hub contributions
are each 1/outdeg ≈ 0, similarity/community structure lives in the
strongest ties).  Sparsifying FIRST shrinks every later shuffle: k·V
edges instead of E, with the skewed tail gone entirely (the skew-salting
in ``graph/skew.py`` becomes unnecessary downstream of this operator).

``top_k_out_edges`` keeps each source's k strongest edges by an
explicit weight (link count, anchor relevance, recency).  The
deterministic tie-break (weight DESC, dst ASC) makes the sparsified
graph a pure function of the input — resumable jobs can recompute it
instead of checkpointing it.

Scale shape: ONE window over (src) — i.e. one shuffle keyed on src —
with rank-k early pruning inside the window operator; no joins, no
driver state.  For the unweighted convenience path the weight is the
edge-multiplicity count (one extra groupBy that the weighted path
skips).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_out_edges(
    edges: DataFrame,
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """(src_id, dst_id, weight, rank) — each source's k strongest edges.

    With ``weight_col=None`` the weight is the duplicate-edge count
    (multi-edges collapse to one weighted row); otherwise duplicate
    (src, dst) rows sum their weights first, so input multiplicity never
    inflates the rank.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if weight_col is None:
        w = edges.groupBy("src_id", "dst_id").agg(
            F.count("*").cast("double").alias("weight")
        )
    else:
        w = edges.groupBy("src_id", "dst_id").agg(
            F.sum(F.col(weight_col).cast("double")).alias("weight")
        )
    win = Window.partitionBy("src_id").orderBy(
        F.desc("weight"), F.asc("dst_id")
    )
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("src_id", "dst_id", "weight", "rank")
    )


def sparsify_stats(edges: DataFrame, sparsified: DataFrame) -> DataFrame:
    """1-row (n_edges, n_kept, keep_frac, max_out_before, max_out_after) —
    what the sparsification bought.  Two degree aggregates + two 1-row
    reductions; used by the bench probe to report the skew collapse."""
    before = edges.groupBy("src_id").agg(F.count("*").alias("d"))
    after = sparsified.groupBy("src_id").agg(F.count("*").alias("d"))
    b = before.agg(
        F.sum("d").alias("n_edges"), F.max("d").alias("max_out_before")
    )
    a = after.agg(F.sum("d").alias("n_kept"), F.max("d").alias("max_out_after"))
    return (
        b.crossJoin(a)
        .select(
            "n_edges",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_edges"), 8).alias("keep_frac"),
            "max_out_before",
            "max_out_after",
        )
    )
