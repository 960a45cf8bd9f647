"""Corpus quality filters — the C4/Gopher-style curation rules.

Web text destined for pretraining gets filtered by structural signals
before any model sees it: repeated-line boilerplate, navigation junk
(lines without terminal punctuation), contact-info PII. These are the
published rule families (C4: Raffel et al. 2020 §2.2; Gopher: Rae et
al. 2021 appendix A) re-expressed as pure Catalyst expressions — one
explode+aggregate per doc for the repetition features, zero-shuffle
string transforms for the line filter and redaction. No Python in any
hot path; every operator has a DuckDB value oracle.

All functions take/return DataFrames keyed by ``id_col`` so they chain
with dedup → quality → sampling → packing into one curation plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
_TERMINAL = (".", "!", "?", '"', "'")


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_lines, dup_line_frac, top_line_frac) — boilerplate signals.

    dup_line_frac: fraction of lines whose (trimmed, lowercased) text
    occurs more than once in the doc. top_line_frac: share held by the
    single most-repeated line. Gopher filters docs where these exceed
    ~0.3 / ~0.2. One explode + two-level aggregate; the per-(doc, line)
    partial count collapses map-side, so a 10^6-line boilerplate doc
    moves one row per distinct line, not per line.
    """
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
        )
        .select("id", F.lower(F.trim(F.col("raw"))).alias("line"))
        .filter(F.length("line") > 0)
    )
    per_line = lines.groupBy("id", "line").agg(F.count("*").alias("c"))
    return per_line.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_lines"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c")
        ).alias("dup_line_frac"),
        (F.max("c") / F.sum("c")).alias("top_line_frac"),
    )


def _line_ok(line: Column, min_words: int) -> Column:
    trimmed = F.trim(line)
    words = F.size(F.filter(F.split(trimmed, r"\s+"), lambda w: F.length(w) > 0))
    ends_ok = F.substring(trimmed, -1, 1).isin(*_TERMINAL)
    return (words >= min_words) & ends_ok


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """(id, clean_text, n_kept, n_dropped) — C4 rule: keep only lines with
    >= min_words words that end in terminal punctuation. Pure per-row
    array expression — zero shuffle, survives any scale by construction."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _line_ok(l, min_words))
    return df.select(
        F.col(id_col).alias("id"),
        # NB: an unwrapped `F.trim` here would receive transform's index as
        # trim's second (trim-chars) argument — silent digit-stripping
        F.array_join(F.transform(kept, lambda l: F.trim(l)), "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (
            F.size(F.filter(lines, lambda l: F.length(F.trim(l)) > 0)) - F.size(kept)
        ).cast("long").alias("n_dropped"),
    )


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, redacted, n_emails, n_phones) — contact-info scrubbing with
    counting (the audit trail curation pipelines keep). Zero shuffle."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0)).cast("long")
    no_email = F.regexp_replace(t, _EMAIL_RE, "[EMAIL]")
    n_phones = F.size(
        F.regexp_extract_all(no_email, F.lit(_PHONE_RE), 0)
    ).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(no_email, _PHONE_RE, "[PHONE]").alias("redacted"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


def perplexity_buckets(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    id_col: str = "id",
    n_buckets: int = 3,
    labels: tuple[str, ...] | None = None,
) -> DataFrame:
    """(id, score, bucket, label): CCNet-style perplexity tertiles.

    CCNet (Wenzek et al. 2020 §3.3) splits a crawl into head/middle/tail
    thirds by LM perplexity and samples each third at different rates —
    the standard quality-stratification step between scoring and
    mixture sampling. ``scored`` is any (id, score) frame (feed
    ``unigram_logprob_scores``; higher score = lower perplexity =
    bucket 1 = head). Buckets are exact NTILE(n) over
    (round(score,8) DESC, id ASC) — the rounding + id tiebreak makes the
    assignment engine-portable for the value oracle.

    Scale shape: NTILE's naive form is a single-partition global window
    (every row through one task). This formulation is exactly
    NTILE-equivalent without it: the two-pass range-partitioned ranker
    (``dense_rank_ids``) finds the n_buckets−1 BOUNDARY keys (the first
    (score,id) of each bucket — unique because the composite key is a
    total order), collects those ≤3 rows, unpersists the rank table, and
    assigns buckets with a pure broadcast comparison — no corpus-sized
    cache or window survives the call, and the assignment pass is a
    zero-shuffle map over the scores.
    """
    from amanogawa_spark.graph.build import dense_rank_ids

    if labels is None:
        labels = (
            ("head", "middle", "tail")
            if n_buckets == 3
            else tuple(f"b{i + 1}" for i in range(n_buckets))
        )
    if len(labels) != n_buckets:
        raise ValueError("labels must have n_buckets entries")
    neg = -F.round(F.col(score_col).cast("double"), 8)
    base = scored.select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("score"),
        F.struct(neg.alias("ns"), F.col(id_col).cast("long").alias("tid")).alias("_k"),
    )
    ranked = dense_rank_ids(base.select("_k"), "_k", out_col="_rk")
    n = ranked.count()
    if n == 0:
        ranked.unpersist()
        return scored.sparkSession.createDataFrame(
            [], "id long, score double, bucket int, label string"
        )
    q, r = divmod(n, n_buckets)
    starts = []
    acc = 0
    for i in range(n_buckets - 1):
        acc += q + 1 if i < r else q
        if acc < n:
            starts.append(acc)
    bdf = scored.sparkSession.createDataFrame(
        [(int(s),) for s in starts], "_rk long"
    )
    bounds = [
        (row["_k"]["ns"], row["_k"]["tid"])
        for row in F.broadcast(bdf).join(ranked, "_rk").select("_k").collect()
    ]
    ranked.unpersist()
    bounds.sort()
    bucket = F.lit(1)
    for bns, btid in bounds:
        ge = (F.col("_k.ns") > F.lit(bns)) | (
            (F.col("_k.ns") == F.lit(bns)) & (F.col("_k.tid") >= F.lit(btid))
        )
        bucket = bucket + ge.cast("int")
    lab = F.element_at(F.array(*[F.lit(x) for x in labels]), F.col("bucket"))
    return base.select("id", "score", bucket.alias("bucket"), "_k").select(
        "id", "score", "bucket", lab.alias("label")
    )


def readability_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(id, n_sentences, n_words, n_syllables, flesch, fk_grade) — the
    classic readability pair (Flesch reading ease, Flesch–Kincaid grade
    level), a standard graded feature in web-text quality filtering
    (too-low AND too-high reading ease both correlate with non-prose:
    word salad vs boilerplate/legalese).

    Heuristics, engine-portable by construction: sentences = non-empty
    ``[.!?]+`` splits (min 1), words = whitespace tokens of the
    normalized text, syllables per word = count of maximal ``[aeiouy]+``
    vowel runs (min 1 per word). All three are integer aggregates —
    the only floats are the two final formula evaluations, so results
    compare exactly after in-query rounding.

    Scale: one explode + one map-side-combined aggregate per doc for the
    syllable sum; sentence/word counts are zero-shuffle expressions.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split(F.col(text_col), r"[.!?]+"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ),
        F.lit(1),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        sentences.cast("long").alias("n_sentences"),
        F.filter(F.split(norm, " "), lambda x: F.length(x) > 0).alias("toks"),
    ).filter(F.size("toks") > 0)
    syl = F.greatest(
        F.size(F.expr("regexp_extract_all(w, '[aeiouy]+', 0)")), F.lit(1)
    )
    per_word = base.select(
        "id", "n_sentences", F.explode("toks").alias("w")
    ).select("id", "n_sentences", syl.cast("long").alias("syl"))
    agg = per_word.groupBy("id", "n_sentences").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("syl").cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    return agg.select(
        "id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.round(F.lit(206.835) - 1.015 * wps - 84.6 * spw, round_to).alias("flesch"),
        F.round(0.39 * wps + 11.8 * spw - F.lit(15.59), round_to).alias("fk_grade"),
    )
