"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

Everything here is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python in the hot path. At 100 TB these are
pure map stages over the document scan: no shuffle, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "que", "de", "los", "una", "por", "con", "para", "las"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization — array<string> (reference util.h:92-107 split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # NULL text counts as 0 tokens — without the coalesce the empty-check is
    # NULL, falls through, and size(split(NULL)) yields -1 (legacy) or NULL
    return F.when(
        F.coalesce(F.length(F.trim(c)), F.lit(0)) == 0, F.lit(0)
    ).otherwise(F.size(tokens(c))).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish count: words + punctuation runs + digit runs, the usual
    cheap stand-in for a BPE tokenizer when estimating token budgets.
    NULL text counts as 0."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(
        F.coalesce(c, F.lit("")), F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0
    )
    return F.size(pieces).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds length / punctuation-ratio / stopword-ratio / mean-word-length
    quality signals (the standard web-text filtering features)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = token_count(c)
    stop = F.array([F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (
        df.withColumn("n_chars_q", F.length(c).cast("long"))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_word_len",
            F.when(n_tok > 0, (F.length(F.regexp_replace(c, r"\s+", "")) / n_tok)).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "punct_ratio",
            F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)),
        )
    )


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic → ``lang_pred`` column.

    Scores each candidate language by marker-word hits in the (lowercased,
    whitespace-split) token set; zero-hit rows → 'und'; equal-score ties
    break deterministically to the lexicographically LAST language code
    (max over (score, lang) structs — matched by the SQL oracle). Pure
    Catalyst expressions, deterministic.
    """
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array([F.lit(w) for w in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # max by (score, lang) — deterministic; require at least one hit
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(col: Column | str, normalize: bool = True) -> Column:
    """64-bit document fingerprint: xxhash64 over whitespace-normalized,
    lowercased text — the exact-dup key (rolling-hash stand-in)."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.xxhash64(c)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The combined per-document profile used by filtering pipelines."""
    out = quality_features(df, text_col)
    out = detect_language(out, text_col)
    return out.withColumn("fingerprint", fingerprint(text_col))
