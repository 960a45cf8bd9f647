"""Full-text retrieval over the corpus: inverted index + BM25 ranking.

The reference engine stops at BoW term counts / cosine-kNN
(``plugin/flow/to_graph/measure.h:54-101``); a training-data pipeline also
needs lexical *retrieval* — scoring documents against query term sets — for
eval-set decontamination audits, targeted corpus slicing ("all docs about
X"), and hard-negative mining. BM25 (Robertson/Spärck Jones, the Okapi
formulation used by Lucene) is the standard scorer.

Scale design (100 TB corpus, small query set):

- term statistics (tf, doc length, document frequency) are each ONE
  map-side-combined aggregate over the exploded tokens — stopword hot keys
  are absorbed by partial aggregation before the shuffle;
- corpus-level scalars (N, avgdl) are a 1-row aggregate cross-joined in —
  broadcast, never a shuffle;
- the query set joins BROADCAST against the tf rows, so only postings of
  query terms flow into scoring; the corpus never reshuffles on text;
- final per-query top-k ranks over (query, doc) score rows — bounded by
  |matching postings|, windowed per query_id.

Determinism: scores are rounded before ranking (both engines), tie-break
is (rounded score desc, doc_id asc) — cross-engine stable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.operators.bow import term_counts


def doc_lengths(tf: DataFrame) -> DataFrame:
    """(id, doc_len) — token count per doc from the (id, term, cnt) frame."""
    return tf.groupBy("id").agg(F.sum("cnt").alias("doc_len"))


def document_frequency(tf: DataFrame) -> DataFrame:
    """(term, df_count) — number of docs containing each term."""
    return tf.groupBy("term").agg(F.count("*").cast("long").alias("df_count"))


def posting_lists(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "whitespace",
    max_postings: int | None = None,
) -> DataFrame:
    """Inverted index: (term, df_count, postings) with postings a
    ``doc:tf`` comma-joined string sorted by doc id — engine-portable and
    value-hashable.

    ``max_postings`` drops terms whose document frequency exceeds the cap
    (stopword guard): a 100 TB corpus's top term would otherwise produce a
    single row holding ~N entries. The cap bounds every output row; for
    full-fidelity stopword postings keep the (id, term, cnt) row form
    (:func:`~amanogawa_spark.operators.bow.term_counts`) instead — rows
    shard, arrays don't.
    """
    tf = term_counts(df, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    lists = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df_count"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("id"), F.col("cnt")))),
                lambda s: F.concat_ws(":", s["id"].cast("string"), s["cnt"].cast("long").cast("string")),
            ),
            ",",
        ).alias("postings"),
    )
    if max_postings is not None:
        lists = lists.filter(F.col("df_count") <= max_postings)
    return lists


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    tokenizer: str = "whitespace",
    round_to: int = 6,
) -> DataFrame:
    """Top-k BM25 docs per query: (query_id, doc_id, score_r, rank).

    ``queries`` is a (query_id, term) frame — one row per query term
    (duplicate terms count once per occurrence, standard bag-of-query-terms
    BM25). IDF is the Robertson–Spärck Jones form with the Lucene +1 floor:
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` — always positive, so stopword
    query terms can't flip rankings negative.
    """
    tf = term_counts(docs, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    dl = doc_lengths(tf)
    dfreq = document_frequency(tf)
    stats = tf.agg(
        F.countDistinct("id").cast("double").alias("n_docs"),
        (F.sum("cnt") / F.countDistinct("id")).alias("avgdl"),
    )

    # query-side statistics first: broadcast the (small) query set against the
    # big dfreq frame, then attach the 1-row corpus scalars — the result is
    # |query terms| rows and is itself broadcast into the posting join, so
    # the vocabulary-sized dfreq never shuffles and neither does the corpus.
    qterms = F.broadcast(queries).join(dfreq, "term").crossJoin(F.broadcast(stats))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_count") + 0.5) / (F.col("df_count") + 0.5)
    )
    tf_norm = (F.col("cnt") * (k1 + 1.0)) / (
        F.col("cnt") + k1 * (1.0 - b + b * F.col("doc_len") / F.col("avgdl"))
    )

    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(dl, "id")
        .select(
            "query_id",
            F.col("id").alias(id_col),
            (idf * tf_norm).alias("partial"),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("partial"), round_to).alias("score_r"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_r", "rank")
    )


def bm25_reference(
    corpus: dict[int, list[str]], queries: dict[int, list[str]],
    k1: float = 1.2, b: float = 0.75,
) -> dict[tuple[int, int], float]:
    """Pure-Python BM25 mirror for pytest oracles (same formulation)."""
    n = len(corpus)
    dl = {d: len(toks) for d, toks in corpus.items()}
    avgdl = sum(dl.values()) / n
    dfreq: dict[str, int] = {}
    for toks in corpus.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    out: dict[tuple[int, int], float] = {}
    for qid, qterms in queries.items():
        for d, toks in corpus.items():
            s = 0.0
            for term in qterms:
                tf = toks.count(term)
                if tf == 0 or term not in dfreq:
                    continue
                idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
                s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl))
            if s > 0.0:
                out[(qid, d)] = s
    return out


def positional_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, doc_id, positions) — sorted 0-based token positions per
    (term, doc).  The phrase-query index: one explode + one grouped
    collect, postings arrays bounded by per-doc term frequency."""
    toks = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    t = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    ).filter(F.length("term") > 0)
    return t.groupBy("term", "doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_occurrences) — documents containing the exact
    consecutive token sequence, with the overlapping-occurrence count.

    Classic positional-intersection: the phrase's k terms' position
    arrays intersect after shifting term i's positions back by i; the
    survivors are valid start positions.  A duplicated phrase term reuses
    the same postings array at both offsets, which is exactly correct.

    Scale shape: the ``isin(phrase terms)`` filter rides the token
    explode inside the scan stage, so ONLY the phrase terms' postings
    ever shuffle (one groupBy doc_id); the per-doc intersection is a
    bounded array op.  The corpus never reshuffles on full text.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    toks = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    tok = (
        df.select(
            F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term")
        )
        .filter(F.col("term").isin(list(set(terms))))
    )
    per = tok.groupBy("doc_id", "term").agg(
        F.sort_array(F.collect_list("pos")).alias("ps")
    )
    m = per.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "ps"))).alias("mm")
    )
    def _shifted(arr, off: int):
        # NOTE: the lambda must be single-parameter — PySpark interprets a
        # two-parameter transform lambda as (element, array_index) and
        # would silently substitute the index for the shift
        return F.transform(arr, lambda x: x - F.lit(off))

    present = None
    starts = None
    for i, w in enumerate(terms):
        arr = F.element_at(F.col("mm"), F.lit(w))
        has = arr.isNotNull()
        present = has if present is None else (present & has)
        shifted = _shifted(arr, i)
        starts = shifted if starts is None else F.array_intersect(starts, shifted)
    return (
        m.filter(present)
        .select("doc_id", F.size(starts).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )

def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    round_to: int = 8,
) -> DataFrame:
    """(query_id, doc_id, rrf_r, rank) — reciprocal-rank fusion
    (Cormack/Clarke/Büttcher): rrf(q, d) = Σ_lists 1 / (k0 + rank_i) —
    the standard score-free way to merge heterogeneous rankers (BM25 ×
    embedding kNN × authority prior) without calibrating their score
    scales; a list missing (q, d) contributes nothing.

    Scale shape: one unionAll over the candidate lists (each already
    top-k-bounded by its ranker), one map-side-combined sum, one
    bounded top-``k`` window per query — no ranker's corpus-sized
    internals are touched here.
    """
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col))).alias("contrib"),
        )
        for r in rankings
    ]
    fused = (
        reduce(DataFrame.unionAll, parts)
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), round_to).alias("rrf_r"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_r"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_r", "rank")
    )
