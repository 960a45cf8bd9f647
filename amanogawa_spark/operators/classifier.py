"""Linear bag-of-words text classifier inference (fastText-style apply).

Production curation pipelines (CCNet, LLaMA, RedPajama-v2, FineWeb) gate
documents with a small linear classifier — "looks like Wikipedia/reference
text" vs "looks like crawl noise". Training such a model is an offline
single-node job; what the 100 TB engine needs is the APPLY: score every
document with broadcast weights, no shuffle of text.

Model: score = σ(b + Σ_t tf(t)·w(t) / Σ_t tf(t)) — mean-of-term-vectors
with a sigmoid, the fastText linear head for a single output class. Terms
absent from the weight table contribute 0 (standard OOV handling).

Scale shape: term counts are one map-side-combined aggregate; the weight
table (vocabulary-sized but model-sized, i.e. tiny vs the corpus) joins
BROADCAST onto the per-doc term rows; the score is one more map-side
combined aggregate back on doc id. Nothing about the corpus ever
reshuffles on raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.operators.bow import term_counts


def linear_classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    round_to: int = 8,
) -> DataFrame:
    """(id, n_tokens, score_r): sigmoid linear score per document.

    ``weights``: (term, weight) — the trained model, broadcast. Documents
    whose every token is OOV score σ(bias); empty documents emit no row
    (they have no term counts).
    """
    tc = term_counts(df, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    w = F.broadcast(weights.select("term", F.col("weight").cast("double")))
    scored = tc.join(w, "term", "left").select(
        "id",
        "cnt",
        (F.col("cnt") * F.coalesce(F.col("weight"), F.lit(0.0))).alias("contrib"),
    )
    logit = F.lit(float(bias)) + F.sum("contrib") / F.sum("cnt")
    return scored.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), round_to).alias("score_r"),
    )


def classifier_filter(
    df: DataFrame,
    weights: DataFrame,
    threshold: float = 0.5,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents scoring ≥ threshold — the quality gate, one
    |docs|-row semi-join back onto the input frame."""
    keep = (
        linear_classifier_scores(
            df, weights, bias=bias, id_col=id_col, text_col=text_col
        )
        .filter(F.col("score_r") >= threshold)
        .select(F.col("id").alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")
