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


def classifier_train(
    df: DataFrame,
    labels: DataFrame,
    rounds: int = 10,
    lr: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    min_df: int = 1,
) -> tuple[DataFrame, float]:
    """Train the fastText-style linear head in-engine: full-batch logistic
    regression by synchronous gradient descent → ((term, weight), bias).

    Model matches :func:`linear_classifier_scores` exactly:
    logit_i = b + Σ_t x_it·w_t with x_it = tf_it / n_i (mean of term
    vectors); loss = mean BCE against ``labels`` (id, label ∈ {0,1}).

    Scale shape — broadcast the MODEL, aggregate the GRADIENTS (the
    data-parallel recipe): the normalized (id, term, x) rows and (id, y)
    labels are built ONCE and persisted; each round is (a) one broadcast
    join of the vocab-sized weight table + map-side-combined per-doc
    logit aggregate, (b) one per-term gradient aggregate, (c) a
    vocab-sized driver collect to step the weights. The corpus text never
    reshuffles; per-round driver traffic is O(vocab) — cap it with
    ``min_df`` (production: also a top-k vocab cap). Gradients, errors,
    and weights round to 12 decimals per round so the trajectory is
    deterministic under any partitioning and engine-portable for the
    DuckDB oracle (same contract as graph/push.py).

    Full-batch GD (not SGD): deterministic, embarrassingly data-parallel,
    and for a convex model with a capped vocab the round count is small;
    minibatch SGD would serialize on the driver without converging
    meaningfully faster at this model size.
    """
    tc = term_counts(df, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    vocab = (
        tc.groupBy("term")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("term")
    )
    tc = tc.join(F.broadcast(vocab), "term")
    n_tok = tc.groupBy("id").agg(F.sum("cnt").alias("n"))
    x = (
        tc.join(n_tok, "id")
        .select("id", "term", (F.col("cnt") / F.col("n")).alias("x"))
        .join(
            labels.select(
                F.col(id_col).alias("id"), F.col("label").cast("double").alias("y")
            ),
            "id",
        )
        .persist()
    )
    n_docs = x.select("id").distinct().count()
    if n_docs == 0:
        raise ValueError("classifier_train: no labeled documents with tokens")
    spark = df.sparkSession
    w: dict[str, float] = {r["term"]: 0.0 for r in vocab.collect()}
    b = 0.0
    for _ in range(rounds):
        wdf = F.broadcast(
            spark.createDataFrame(list(w.items()), "term string, w double")
        )
        err = (
            x.join(wdf, "term", "left")
            .groupBy("id", "y")
            .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("xw"))
            .select(
                "id",
                F.round(
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.lit(b) + F.col("xw"))))
                    - F.col("y"),
                    12,
                ).alias("e"),
            )
        )
        grads = (
            x.join(err, "id")
            .groupBy("term")
            .agg(F.round(F.sum(F.col("e") * F.col("x")) / n_docs, 12).alias("g"))
        )
        gb = err.agg(
            F.round(F.coalesce(F.sum("e"), F.lit(0.0)) / n_docs, 12).alias("gb")
        ).collect()[0]["gb"]
        for r in grads.collect():
            w[r["term"]] = round(w[r["term"]] - lr * r["g"], 12)
        b = round(b - lr * gb, 12)
    x.unpersist()
    weights = spark.createDataFrame(
        sorted(w.items()), "term string, weight double"
    )
    return weights, b

def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
    round_to: int = 8,
) -> DataFrame:
    """(bin, n, mean_score, frac_pos, abs_gap) — the reliability table
    for a probabilistic quality gate: bucket scores into ``n_bins``
    equal-width bins and compare each bin's mean predicted probability
    with its observed positive rate.  |gap| per bin is the basis of
    expected calibration error; a well-calibrated gate's threshold can
    be read as an actual precision level.

    One map-side-combined aggregate over (bin) — no sort, no collect.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    out = df.groupBy(b.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg(score_col), round_to).alias("mean_score"),
        F.round(F.avg(F.col(label_col).cast("double")), round_to).alias(
            "frac_pos"
        ),
    )
    return out.withColumn(
        "abs_gap",
        F.round(F.abs(F.col("mean_score") - F.col("frac_pos")), round_to),
    )
