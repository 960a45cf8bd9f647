"""Bag-of-words cosine kNN graph — reference ``to_graph`` bow-mode parity.

The reference tokenizes one string column (MeCab wakati,
``plugin/flow/to_graph/to_graph.cpp:118-130``, ``measure.h:80-88``),
builds per-row term-count maps, and takes cosine top-k over them
(``measure.h:54-78``). Here the same semantics run as a **sparse
similarity self-join**: docs only meet on shared terms, so the pair
explosion is bounded by the posting-list sizes instead of O(n²) — the
classic scalable formulation (and optionally capped by dropping
ultra-common terms, the standard df-cut).

Pipeline (all built-in ops, one shuffle per stage):
  tokenize → explode → groupBy(doc, term).count  [term counts]
  → join on term (posting-list self-join) → groupBy(pair).sum  [dots]
  → join norms → cosine → window top-k per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# Unicode-script run segmentation (Java regex; Spark-side). The reference's
# bow mode is MeCab `-Owakati` (measure.h:82-88; its README demo corpus is
# Japanese, README.md:82-114) — a dictionary segmenter we can't (and
# shouldn't) ship. Deterministic stand-in with the same non-degeneracy
# property on CJK text: Han chars become unigram tokens (the dictionary-less
# baseline for Han), Hiragana / Katakana(+ー) runs and latin/digit runs
# become one token each. Pure Catalyst regexp — JVM codegen, no Python in
# the hot path, and RE2-mirrorable for the DuckDB oracle
# (\p{IsHan} in Java == \p{Han} in RE2).
WAKATI_PATTERN_JAVA = r"\p{IsHan}|[\p{IsHiragana}]+|[\p{IsKatakana}ー]+|[a-z0-9]+"
WAKATI_PATTERN_RE2 = r"\p{Han}|[\p{Hiragana}]+|[\p{Katakana}ー]+|[a-z0-9]+"


def wakati_tokens(col) -> "F.Column":
    """array<string> of script-run tokens from lowercased text (see
    WAKATI_PATTERN_JAVA). Whitespace and punctuation never match, so they
    act as boundaries; Japanese text segments without any dictionary."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(WAKATI_PATTERN_JAVA), 0)


def subword_ngrams(col, n: int = 3) -> "F.Column":
    """array<string> of fastText-style character n-grams: each whitespace
    word of the lowercased text is wrapped ``<w>`` (so prefixes/suffixes
    get distinct grams) and sliced into all length-``n`` substrings.
    Pure Catalyst (nested transform + flatten) — generated map-side in
    the scan; the subword feature space is what makes a linear quality
    classifier robust to misspellings/OOV on crawl text (Bojanowski et
    al. 2017)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(
        F.split(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")), " "),
        lambda w: F.length(w) > 0,
    )
    wrapped = F.transform(
        words, lambda w: F.concat(F.lit("<"), w, F.lit(">"))
    )
    eligible = F.filter(wrapped, lambda w: F.length(w) >= n)
    return F.flatten(
        F.transform(
            eligible,
            lambda w: F.transform(
                F.sequence(F.lit(1), F.length(w) - (n - 1)),
                lambda i: w.substr(i, F.lit(n)),
            ),
        )
    )


def term_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    hash_buckets: int | None = None,
    hash: str = "xxhash64",
) -> DataFrame:
    """(id, term, cnt). tokenizer: 'whitespace' (reference default corpus
    behavior for pre-segmented text), 'wakati' (Unicode-script runs —
    CJK-capable, see :func:`wakati_tokens`), or 'subword3' (fastText-style
    char 3-grams of ``<w>``-wrapped words, :func:`subword_ngrams`).

    ``hash_buckets``: the hashing trick — fold terms onto ``'h<bucket>'``
    ids with ``bucket = hash(term) % hash_buckets``, bounding the feature
    space (and thus classifier vocab / broadcast size) REGARDLESS of
    corpus size; the 100 TB default for subword features, whose raw
    cardinality is unbounded on unicode crawl text. ``hash='md5'`` is the
    engine-portable flavour for value oracles."""
    if tokenizer == "wakati":
        toks = F.explode(wakati_tokens(F.col(text_col))).alias("term")
    elif tokenizer == "subword3":
        toks = F.explode(subword_ngrams(F.col(text_col), 3)).alias("term")
    else:
        toks = F.explode(
            F.split(F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " ")
        ).alias("term")
    out = df.select(F.col(id_col).alias("id"), toks).filter(F.length("term") > 0)
    if hash_buckets is not None:
        if hash == "md5":
            h = F.conv(F.substring(F.md5(F.encode("term", "UTF-8")), 1, 15), 16, 10)
        else:
            h = F.xxhash64("term")
        out = out.select(
            "id",
            F.concat(
                F.lit("h"), F.pmod(h.cast("long"), F.lit(hash_buckets)).cast("string")
            ).alias("term"),
        )
    return (
        out.groupBy("id", "term")
        .agg(F.count("*").cast("double").alias("cnt"))
    )


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    min_df: int = 1,
) -> DataFrame:
    """(id, term, tf, df_count, tfidf) — smoothed TF-IDF term weighting.

    tf = count/doc_len; idf = ln((N+1)/(df+1)) + 1 (the sklearn-style
    smooth form: no division by zero, unseen-term idf bounded). ``min_df``
    drops terms appearing in fewer than that many docs (vocab noise cut).

    Scale shape: term counts are one map-side-combined shuffle; doc length
    and document frequency are windows/aggregates over that SAME (id, term)
    frame — no re-tokenization; N is a 1-row aggregate broadcast-cross-
    joined in-plan (no driver action, fully lazy/composable). The weighted
    vectors feed :func:`bow_cosine_topk`-style joins or vocabulary pruning
    for training-data curation at corpus scale.
    """
    tc = term_counts(df, id_col, text_col, tokenizer)
    wlen = Window.partitionBy("id")
    tc = tc.withColumn("doc_len", F.sum("cnt").over(wlen))
    dfreq = tc.groupBy("term").agg(F.count("*").cast("long").alias("df_count"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df_count") >= min_df)
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    return (
        tc.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            (F.col("cnt") / F.col("doc_len")).alias("tf"),
            "df_count",
            (
                (F.col("cnt") / F.col("doc_len"))
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df_count") + 1.0))
                    + 1.0
                )
            ).alias("tfidf"),
        )
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, n_tokens, avg_logprob) — corpus-trained unigram LM score.

    The classic LM quality filter (CCNet-style): train a unigram model on
    the corpus itself (Laplace-smoothed: p(t) = (tf_t + 1) / (T + V)) and
    score each document by its mean token log-probability. Gibberish,
    OCR noise, and rare-token spam sit far below the corpus mode;
    curation keeps a percentile band.

    Two passes over the SAME (id, term, cnt) aggregate: global term
    frequencies (map-side combined) and the per-doc weighted mean,
    joined back on ``term``. Corpus totals (T, V) ride along as a 1-row
    broadcast cross join — fully lazy, no driver action, pure Catalyst.
    """
    tc = term_counts(df, id_col, text_col, tokenizer)
    vocab = tc.groupBy("term").agg(F.sum("cnt").alias("tf"))
    totals = vocab.agg(
        F.sum("tf").alias("tt"), F.count("*").cast("double").alias("vv")
    )
    scored = (
        tc.join(vocab, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            "cnt",
            (F.col("cnt") * F.log((F.col("tf") + 1.0) / (F.col("tt") + F.col("vv")))).alias(
                "w_logp"
            ),
        )
    )
    return scored.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        (F.sum("w_logp") / F.sum("cnt")).alias("avg_logprob"),
    )


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambda_bi: float = 0.75,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob) — corpus-trained interpolated bigram LM.

    The KenLM-lite upgrade of :func:`unigram_logprob_scores`: word order
    now matters, so shuffled-word spam and n-gram-stuffed SEO text score
    low even when their unigram profile looks natural. Model:

        p(w2 | w1) = λ · c(w1,w2)/c(w1)  +  (1−λ) · (tf(w2)+1)/(T+V)

    with c(·) corpus occurrence counts (context count = total occurrences
    of w1 — the simple consistent choice, mirrored exactly in the oracle)
    and the Laplace unigram as the backoff mass. Documents with fewer
    than 2 tokens emit no row.

    Scale: bigrams come from ``arrays_zip`` of the token array with its
    own tail — NO positional self-join; corpus bigram/unigram counts are
    two map-side-combined aggregates; scoring joins each doc-bigram
    occurrence to the two count tables (shuffles on the n-gram keys,
    stopword heat absorbed by partial aggregation) and one 1-row
    broadcast of (T, V).
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = F.filter(F.split(norm, " "), lambda x: F.length(x) > 0)
    n = F.size("toks")
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    bigrams = (
        base.filter(n >= 2)
        .select(
            "id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("b"),
        )
        .select("id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    uni = (
        base.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    totals = uni.agg(F.sum("tf").alias("tt"), F.count("*").cast("double").alias("vv"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("cb"))

    lam = float(lambda_bi)
    scored = (
        bigrams.join(bi, ["w1", "w2"])
        .join(uni.select(F.col("term").alias("w1"), F.col("tf").alias("c1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("tf").alias("t2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.log(
                lam * F.col("cb") / F.col("c1")
                + (1.0 - lam) * (F.col("t2") + 1.0) / (F.col("tt") + F.col("vv"))
            ).alias("logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.avg("logp").alias("avg_logprob"),
    )


def kneser_ney_bigram_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob) — interpolated Kneser–Ney bigram LM.

    The standard-smoothing upgrade of :func:`bigram_logprob_scores`: the
    backoff distribution is the CONTINUATION unigram (how many distinct
    contexts precede w2), not raw frequency — so "francisco" (frequent
    but always after "san") stops inflating novel contexts, the failure
    mode simple interpolation has on boilerplate-heavy web text. Model
    (fixed discount D):

        p(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
                   + D · N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)

    with c(w1·) = Σ_w2 c(w1,w2), N1+(w1·)/N1+(·w2) the distinct
    continuation/context type counts and N1+(··) the total bigram type
    count. Corpus-trained on the scoring set itself, so every scored
    bigram has c ≥ 1 and the probability is strictly positive.

    Scale: one ``arrays_zip`` explode produces bigram occurrences; the
    count table c(w1,w2) is a map-side-combined aggregate and ALL four
    model tables (context totals, forward types, continuation types,
    total types) derive from that already-small TYPE table — no second
    pass over the corpus. Scoring re-joins occurrences on w1/w2 (the
    same keys the counts shuffled on) plus a 1-row broadcast.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = F.filter(F.split(norm, " "), lambda x: F.length(x) > 0)
    n = F.size("toks")
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    bigrams = (
        base.filter(n >= 2)
        .select(
            "id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("b"),
        )
        .select("id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    cb = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("cb"))
    ctx = cb.groupBy("w1").agg(
        F.sum("cb").alias("c1"), F.count("*").cast("double").alias("fwd")
    )
    cont = cb.groupBy("w2").agg(F.count("*").cast("double").alias("rev"))
    tot = cb.agg(F.count("*").cast("double").alias("nn"))

    d = float(discount)
    scored = (
        bigrams.join(cb, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.log(
                F.greatest(F.col("cb") - d, F.lit(0.0)) / F.col("c1")
                + d * F.col("fwd") / F.col("c1") * F.col("rev") / F.col("nn")
            ).alias("logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.avg("logp").alias("avg_logprob"),
    )


def bow_cosine_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_df: int | None = None,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact BoW cosine top-k per doc.

    ``max_df`` drops terms appearing in more than that many docs (hub-term
    skew cut: a term in f docs contributes f² join pairs — the df-cut
    bounds the worst posting list, the BoW analogue of hub-vertex salting).
    """
    tc = term_counts(df, id_col, text_col, tokenizer)
    if max_df is not None:
        rare = (
            tc.groupBy("term").agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_df)
            .select("term")
        )
        tc = tc.join(rare, "term", "left_semi")
    # tc is referenced 3x (norms + both join sides); an eager localCheckpoint
    # materializes it once with truncated lineage and its blocks are freed
    # when the returned frame is GC'd — a persist()/unpersist() pair here
    # would deregister the cache before the caller ever materializes the
    # (lazy) result, recomputing the tokenize+aggregate three times
    tc = tc.localCheckpoint(eager=True)
    norms = tc.groupBy("id").agg(F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("norm"))
    a = tc.select(F.col("id").alias("query_id"), "term", F.col("cnt").alias("ca"))
    b = tc.select(F.col("id").alias("neighbor_id"), "term", F.col("cnt").alias("cb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    sims = (
        dots.join(norms.select(F.col("id").alias("query_id"), F.col("norm").alias("na")), "query_id")
        .join(norms.select(F.col("id").alias("neighbor_id"), F.col("norm").alias("nb")), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def bow_knn_graph(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_df: int | None = None,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """Undirected deduped (src_id, dst_id) edges from BoW top-k — mirrors the
    reference's min/max-canonicalized edge emission (to_graph.cpp:82-86)."""
    topk = bow_cosine_topk(df, id_col, text_col, k, max_df, tokenizer)
    return (
        topk.select(
            F.least("query_id", "neighbor_id").alias("src_id"),
            F.greatest("query_id", "neighbor_id").alias("dst_id"),
        )
        .distinct()
    )
