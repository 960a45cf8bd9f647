"""Ranked-retrieval evaluation: NDCG@k, MRR@k, precision@k, recall@k.

The evaluation counterpart of the retrieval operators (``operators/
retrieval.py`` BM25, ``operators/similarity.py`` ANN, RRF fusion): given a
scored candidate table and graded relevance judgments, emit the standard
IR metrics per query. Complements :func:`amanogawa_spark.operators.stats.
ranking_auc` (corpus-level binary AUC) with the per-query graded view.

Scale: one broadcast-or-hash join against the (small) qrels table and two
windows PARTITIONED BY QUERY — no global window, no driver loop; millions
of queries evaluate in one shuffle keyed on query_id.

The reference engine has no retrieval or evaluation surface (SURVEY §2.4
aggregate inventory is empty); engine addition for the training-data
pipeline story (offline eval of rankers feeding curation decisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query (query_id, ndcg_r, mrr_r, precision_r, recall_r) at
    cutoff ``k``.

    ``results``: scored candidates; rank = score desc, doc asc (the tie
    break must be total or the metric isn't reproducible). ``qrels``:
    graded judgments (rel >= 1 counts as relevant for MRR/P/R; NDCG uses
    the graded ``(2^rel - 1) / log2(rank+1)`` form). Queries present in
    ``results`` but without judged-relevant docs emit 0 metrics; IDCG is
    the per-query ideal over ALL judged docs truncated at k.
    """
    q, d = F.col(query_col), F.col(doc_col)
    rank_w = Window.partitionBy("q").orderBy(F.col("s").desc(), F.col("d").asc())
    ranked = (
        results.select(q.alias("q"), d.alias("d"), F.col(score_col).alias("s"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
    )
    judged = qrels.select(
        q.alias("q"), d.alias("d"), F.col(rel_col).cast("double").alias("rel")
    )
    hits = ranked.join(judged, ["q", "d"], "left").select(
        "q",
        "rank",
        F.coalesce("rel", F.lit(0.0)).alias("rel"),
    )
    got = hits.groupBy("q").agg(
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
            / F.log2(F.col("rank") + F.lit(1.0))
        ).alias("dcg"),
        F.max(
            F.when(F.col("rel") >= 1.0, 1.0 / F.col("rank")).otherwise(0.0)
        ).alias("mrr"),
        F.sum(F.when(F.col("rel") >= 1.0, 1).otherwise(0)).alias("n_hit"),
    )
    ideal_w = Window.partitionBy("q").orderBy(F.col("rel").desc(), F.col("d").asc())
    ideal = (
        judged.filter(F.col("rel") >= 1.0)
        .withColumn("irank", F.row_number().over(ideal_w))
        .groupBy("q")
        .agg(
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
                    / F.log2(F.col("irank") + F.lit(1.0)),
                ).otherwise(0.0)
            ).alias("idcg"),
            F.count("*").alias("n_rel"),
        )
    )
    return (
        got.join(ideal, "q", "left")
        .select(
            F.col("q").alias(query_col),
            F.round(
                F.when(
                    F.coalesce("idcg", F.lit(0.0)) > 0.0,
                    F.col("dcg") / F.col("idcg"),
                ).otherwise(0.0),
                8,
            ).alias("ndcg_r"),
            F.round("mrr", 8).alias("mrr_r"),
            F.round(F.col("n_hit") / F.lit(float(k)), 8).alias("precision_r"),
            F.round(
                F.when(
                    F.coalesce("n_rel", F.lit(0)) > 0,
                    F.col("n_hit") / F.col("n_rel"),
                ).otherwise(0.0),
                8,
            ).alias("recall_r"),
        )
    )
