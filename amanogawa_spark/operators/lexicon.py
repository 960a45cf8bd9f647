"""Lexicon tagging and blocklist filtering — broadcast-wordlist curation.

The standard "bad-words fraction" gate every web-corpus pipeline runs
(C4 drops pages containing blocklist terms, Raffel et al. 2020 §2.2;
RefinedWeb and Gopher keep graded NSFW-word fractions as features):
given a lexicon of words and multi-word phrases, annotate every document
with its match count, matched-term set, and matched-token fraction, then
filter on a threshold.

Scale shape: the lexicon is tiny (wordlists are KBs–MBs) and rides a
broadcast hash join, so the corpus-sized token stream never shuffles —
tokens explode map-side, join against the broadcast lexicon map-side,
and collapse to one partial row per (doc, term) before the only
exchange, a per-doc aggregate. Phrase support generates n-grams only
for the phrase lengths actually present in the lexicon (a lexicon of
unigrams adds zero n-gram work). No Python in the plan — tokenization,
n-grams, and counting are all Catalyst expressions.

Reference parity note: the reference engine has no curation surface at
all (its flow.filter is a pass-through stub, ``plugin/flow/filter/
filter.cpp:19-28``); this module is an engine addition for the
training-data pipeline, same family as ``operators/quality.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    """Lowercased alphanumeric word stream — the split both engines can
    mirror exactly (DuckDB: regexp_split_to_array + list_filter)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


def _ngrams(ts: Column, n: int) -> Column:
    """Space-joined n-grams of the token array. Guarded: Spark's
    ``sequence(0, size-n)`` DESCENDS when size < n (sequence(0,-1) =
    [0,-1]), which would feed slice() a zero start — so short docs get
    an explicit empty array instead."""
    if n == 1:
        return ts
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ts) - n),
        lambda i: F.array_join(F.slice(ts, i + F.lit(1), n), " "),
    )
    return F.when(F.size(ts) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def lexicon_hits(
    df: DataFrame,
    lexicon: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, hits, hit_frac, matched_csv) per input row.

    ``hits`` counts every occurrence of every lexicon entry (a term
    matched 3× contributes 3); ``hit_frac`` = hits / n_tokens (0.0 for
    empty docs), rounded to 8 places so the value is engine-portable;
    ``matched_csv`` is the sorted distinct matched terms, comma-joined
    (a flat string rather than array<string> so oracle value-hashing is
    representation-independent). Multi-word lexicon entries match as
    token n-grams — "fast table" hits wherever those two tokens are
    adjacent. Docs with zero hits are kept (hits=0, matched_csv='').
    """
    spark = df.sparkSession
    terms = sorted({" ".join(t.lower().split()) for t in lexicon} - {""})
    if not terms:
        raise ValueError("lexicon_hits: lexicon is empty")
    ns = sorted({len(t.split(" ")) for t in terms})
    lex = spark.createDataFrame([(t,) for t in terms], "term string")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        _tokens(F.col(text_col)).alias("ts"),
    ).select("id", "ts", F.size("ts").cast("long").alias("n_tokens"))
    grams = base.select(
        "id",
        F.explode(F.flatten(F.array(*[_ngrams(F.col("ts"), n) for n in ns]))).alias(
            "gram"
        ),
    )
    hits = (
        grams.join(F.broadcast(lex), grams["gram"] == lex["term"])
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("hits"),
            F.array_join(F.sort_array(F.collect_set("term")), ",").alias(
                "matched_csv"
            ),
        )
    )
    n_hits = F.coalesce(F.col("hits"), F.lit(0)).cast("long")
    frac = F.when(
        F.col("n_tokens") > 0, n_hits.cast("double") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    return (
        base.select("id", "n_tokens")
        .join(hits, "id", "left")
        .select(
            "id",
            "n_tokens",
            n_hits.alias("hits"),
            F.round(frac, 8).alias("hit_frac"),
            F.coalesce("matched_csv", F.lit("")).alias("matched_csv"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    lexicon: list[str],
    max_frac: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``df`` whose lexicon hit fraction is <= ``max_frac``
    (default: drop any doc containing any blocklist term). Semi-join on
    the kept-id set, so the output carries the caller's full schema."""
    kept = (
        lexicon_hits(df, lexicon, id_col=id_col, text_col=text_col)
        .filter(F.col("hit_frac") <= max_frac)
        .select(F.col("id").alias(id_col))
    )
    return df.join(kept, id_col, "left_semi")
