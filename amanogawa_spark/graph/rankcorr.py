"""Rank-correlation diagnostics between two vertex scorings.

Crawl operators re-rank the web between snapshots and need to know HOW
MUCH the ordering moved: Spearman's ρ over the common vertices (did the
global ordering churn?) and top-k Jaccard overlap (did the head — the
part that drives crawl priority and serving — churn?).  Consumes any
two (id, score) tables: two PageRank snapshots (``graph/diff.py``
produces the edge-level deltas; this is the score-level companion),
PageRank vs in-degree (is the cheap proxy good enough?), TrustRank vs
PageRank (spam displacement).

Positions are the deterministic total order (score DESC, id ASC) — the
tie-broken variant of Spearman, exactly mirrorable in SQL.  Ranking
uses the two-pass range-partitioned ranker (``graph/build.py``
``dense_rank_ids``), NOT a global single-partition window, so the
operator holds at 10^12 vertices; the ρ itself is a closed-form 1-row
aggregate  ρ = 1 − 6·Σd² / (n·(n²−1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.graph.build import dense_rank_ids


def rank_positions(
    scores: DataFrame,
    score_col: str = "score",
    id_col: str = "id",
    out_col: str = "pos",
) -> DataFrame:
    """(id, pos) — 0-based global position under (score DESC, id ASC),
    computed by the range-partitioned two-pass ranker (no global
    single-partition window)."""
    keyed = scores.select(
        F.col(id_col).alias("id"),
        F.struct(
            (F.col(score_col).cast("double") * -1).alias("_neg"),
            F.col(id_col).alias("_id"),
        ).alias("_k"),
    )
    ranked = dense_rank_ids(keyed, "_k", out_col=out_col)
    out = ranked.select("id", out_col)
    # dense_rank_ids returns a persisted frame; the projection keeps the
    # lineage but the caller-visible result is small — release the cache
    # after materializing downstream is the caller's choice; here we
    # localCheckpoint + unpersist so no corpus-sized cache outlives us
    chk = out.localCheckpoint(eager=True)
    ranked.unpersist()
    return chk


def spearman_rho(
    a: DataFrame,
    b: DataFrame,
    score_col: str = "score",
    id_col: str = "id",
) -> DataFrame:
    """1-row (n_common, rho) — Spearman's ρ between two scorings over
    their common ids, tie-broken deterministically.  Ids present in only
    one table are excluded (re-ranked within the intersection)."""
    common = a.select(F.col(id_col).alias("id"), F.col(score_col).alias("_sa")).join(
        b.select(F.col(id_col).alias("id"), F.col(score_col).alias("_sb")),
        "id",
    )
    pa = rank_positions(common, "_sa", "id", out_col="pos_a")
    pb = rank_positions(common, "_sb", "id", out_col="pos_b")
    j = pa.join(pb, "id")
    d2 = (F.col("pos_a") - F.col("pos_b")).cast("double")
    return j.agg(
        F.count("*").alias("n_common"),
        F.round(
            F.lit(1.0)
            - F.try_divide(
                F.lit(6.0) * F.sum(d2 * d2),
                F.count("*").cast("double")
                * (F.count("*").cast("double") * F.count("*").cast("double") - 1.0),
            ),
            8,
        ).alias("rho"),
    )


def top_k_overlap(
    a: DataFrame,
    b: DataFrame,
    k: int = 100,
    score_col: str = "score",
    id_col: str = "id",
) -> DataFrame:
    """1-row (k, n_both, jaccard) — head agreement of two scorings.
    Top-k extraction is ``orderBy(...).limit(k)`` (TakeOrderedAndProject:
    per-partition heaps, k-row merge — no global sort)."""
    if k <= 0:
        raise ValueError("k must be positive")

    def _top(df: DataFrame) -> DataFrame:
        return (
            df.orderBy(F.desc(score_col), F.asc(id_col))
            .limit(k)
            .select(F.col(id_col).alias("id"))
        )

    ta, tb = _top(a), _top(b)
    n_both = ta.join(tb, "id").count()
    n_union = ta.unionAll(tb).distinct().count()
    spark = a.sparkSession
    return spark.createDataFrame(
        [(k, n_both, round(n_both / n_union, 8) if n_union else None)],
        "k int, n_both long, jaccard double",
    )
