"""Word co-occurrence graph with PMI scoring.

Turns a document corpus into a weighted word graph: vertices are terms,
edges connect terms that co-occur within a sliding window, weights are
(positive) pointwise mutual information.  The word graph feeds keyword
extraction (TextRank runs the engine's PageRank over it), collocation
mining, and topic drift detection between crawl snapshots.

Scale shape: pair generation is PURE map-side Catalyst — the token
array expands to its windowed pairs with ``transform``/``flatten``/
``explode`` inside the scan stage, so no shuffle happens until the
single (term_a, term_b) count aggregate (map-side partial combine
applies).  Term totals ride a second small aggregate joined back by
broadcast.  No Python UDFs anywhere.

PMI(x, y) = ln( (c(x,y) / P) / ( (c(x) / T) · (c(y) / T) ) )
with P = total windowed pairs, T = total tokens — the standard
collocation measure (Church & Hanks 1990).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def cooccurrence_pairs(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
) -> DataFrame:
    """(term_a, term_b, n_pair) — unordered co-occurrence counts within
    ``window`` forward positions; self-pairs dropped, pair canonicalized
    (term_a < term_b)."""
    if window <= 0:
        raise ValueError("window must be positive")
    toks = F.split(_norm(F.col(text_col)), " ")
    n = F.size(toks)
    # map-side pair list: for i in [0, n-1), for d in [1, window]:
    # (t[i], t[i+d]) — generated inside the scan stage, no shuffle
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(window), n - 1)),
            lambda d: F.zip_with(
                F.slice(toks, 1, n - d),
                F.slice(toks, d + 1, n - d),
                lambda a, b: F.struct(
                    F.least(a, b).alias("term_a"),
                    F.greatest(a, b).alias("term_b"),
                ),
            ),
        )
    )
    return (
        docs.filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.term_a").alias("term_a"), F.col("p.term_b").alias("term_b"))
        .filter(F.col("term_a") != F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_pair"))
    )


def pmi_scores(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 2,
) -> DataFrame:
    """(term_a, term_b, n_pair, pmi) — PMI-weighted word graph edges with
    ``n_pair ≥ min_count``."""
    pairs = cooccurrence_pairs(docs, text_col, window).filter(
        F.col("n_pair") >= min_count
    )
    toks = F.split(_norm(F.col(text_col)), " ")
    terms = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c_term"))
    )
    totals = terms.agg(
        F.sum("c_term").alias("t_tokens")
    ).crossJoin(
        cooccurrence_pairs(docs, text_col, window).agg(
            F.sum("n_pair").alias("p_pairs")
        )
    )
    # term totals join as plain shuffle-hash joins: a web-scale token
    # vocabulary (misspellings, ids, urls) is NOT reliably broadcastable;
    # only the 1-row totals frame is
    return (
        pairs.join(
            terms.select(F.col("term").alias("term_a"), F.col("c_term").alias("c_a")).hint(
                "shuffle_hash"
            ),
            "term_a",
        )
        .join(
            terms.select(F.col("term").alias("term_b"), F.col("c_term").alias("c_b")).hint(
                "shuffle_hash"
            ),
            "term_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "term_a",
            "term_b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("p_pairs"))
                    / ((F.col("c_a") / F.col("t_tokens")) * (F.col("c_b") / F.col("t_tokens")))
                ),
                6,
            ).alias("pmi"),
        )
    )
