"""BoW cosine kNN graph vs a pure-python oracle (reference to_graph bow parity)."""

from __future__ import annotations

import math
from collections import Counter

import pytest


def _bow_cosine(a: str, b: str) -> float:
    ca = Counter(a.lower().split())
    cb = Counter(b.lower().split())
    dot = sum(ca[t] * cb[t] for t in ca)
    na = math.sqrt(sum(v * v for v in ca.values()))
    nb = math.sqrt(sum(v * v for v in cb.values()))
    return dot / (na * nb) if na and nb else 0.0


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark graph engine for link analysis"),
        (1, "spark graph engine for web analysis"),
        (2, "spark streaming engine"),
        (3, "recipe for chocolate cake with cream"),
        (4, "recipe for lemon cake with sugar"),
        (5, "zebra quantum xylophone"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_bow_topk_matches_oracle(spark, docs):
    from amanogawa_spark.operators.bow import bow_cosine_topk

    df, rows = docs
    got = bow_cosine_topk(df, k=2).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, -r.cosine, r.neighbor_id)):
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, round(r.cosine, 9)))
    for i, ti in rows:
        sims = sorted(
            ((j, _bow_cosine(ti, tj)) for j, tj in rows if j != i and _bow_cosine(ti, tj) > 0),
            key=lambda p: (-p[1], p[0]),
        )[:2]
        expected = [(j, round(s, 9)) for j, s in sims]
        assert by_q.get(i, []) == expected, f"doc {i}"


def test_bow_knn_graph_shape(spark, docs):
    from amanogawa_spark.operators.bow import bow_knn_graph

    df, _ = docs
    e = bow_knn_graph(df, k=2).collect()
    pairs = [(r.src_id, r.dst_id) for r in e]
    assert len(pairs) == len(set(pairs))
    assert all(s < d for s, d in pairs)
    # doc 5 shares no terms → contributes no edges
    assert all(5 not in p for p in pairs)


def test_bow_max_df_cut(spark, docs):
    from amanogawa_spark.operators.bow import bow_cosine_topk

    df, _ = docs
    # "for" appears in 4 docs; max_df=3 removes it from all dots
    got = bow_cosine_topk(df, k=2, max_df=3).collect()
    # docs 0 and 3 now share no terms ("for" was their only overlap)
    pairs = {(r.query_id, r.neighbor_id) for r in got}
    assert (3, 0) not in pairs and (0, 3) not in pairs


def test_wakati_tokens_japanese(spark):
    """Unicode-script segmentation: unsegmented Japanese must split into
    multiple tokens (whitespace splitting yields ONE token per sentence —
    the round-1 degeneration on the reference's MeCab-wakati bow mode)."""
    from pyspark.sql import functions as F

    from amanogawa_spark.operators.bow import wakati_tokens

    rows = [
        (0, "天の川はデータ処理エンジンです"),
        (1, "ケーキのレシピと砂糖"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {
        r.doc_id: r.t
        for r in df.select("doc_id", wakati_tokens("text").alias("t")).collect()
    }
    assert toks[0] == ["天", "の", "川", "は", "データ", "処", "理", "エンジン", "です"]
    assert toks[1] == ["ケーキ", "の", "レシピ", "と", "砂", "糖"]


def test_bow_wakati_knn_japanese(spark):
    """BoW-kNN over raw Japanese: with the wakati tokenizer doc 0's nearest
    neighbor is the topically-similar doc 1; with whitespace tokenization
    every doc is a single unique token and the posting-list join finds NO
    pairs at all (the degeneration this tokenizer exists to fix)."""
    from amanogawa_spark.operators.bow import bow_cosine_topk

    rows = [
        (0, "天の川はデータ処理エンジンです"),
        (1, "天の川は高速なグラフ処理エンジンです"),
        (2, "ケーキのレシピと砂糖とクリーム"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bow_cosine_topk(df, k=1, tokenizer="wakati").collect()
    best = {r.query_id: (r.neighbor_id, r.cosine) for r in got}
    assert best[0][0] == 1 and best[0][1] > 0.5
    assert best[1][0] == 0
    degenerate = bow_cosine_topk(df, k=1, tokenizer="whitespace").collect()
    assert len(degenerate) == 0


def test_subword_ngrams_and_hashing_trick(spark):
    from amanogawa_spark.operators.bow import term_counts

    df = spark.createDataFrame([(1, "cat hat"), (2, "a")], "doc_id long, text string")
    tc = {
        (r["id"], r["term"]): r["cnt"]
        for r in term_counts(df, tokenizer="subword3").collect()
    }
    # '<cat>' -> <ca, cat, at>; '<hat>' -> <ha, hat, at>; '<a>' -> <a>
    assert tc[(1, "<ca")] == 1.0 and tc[(1, "cat")] == 1.0 and tc[(1, "at>")] == 2.0
    assert tc[(2, "<a>")] == 1.0
    assert (1, "<a>") not in tc

    hashed = term_counts(df, tokenizer="subword3", hash_buckets=8).collect()
    assert all(r["term"].startswith("h") and int(r["term"][1:]) < 8 for r in hashed)
    # hashing preserves total gram mass per doc
    import collections

    raw_mass = collections.Counter()
    for (i, _t), c in tc.items():
        raw_mass[i] += c
    hashed_mass = collections.Counter()
    for r in hashed:
        hashed_mass[r["id"]] += r["cnt"]
    assert raw_mass == hashed_mass


def test_classifier_trains_on_hashed_subwords(spark):
    # the fastText shape end-to-end: subword-hashed features -> linear head
    from amanogawa_spark.operators.bow import term_counts
    from pyspark.sql import functions as F

    docs = [(i, "good clean reference text here") for i in range(8)]
    docs += [(i + 8, "spammy zzz buy now click zzz") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    feats = term_counts(df, tokenizer="subword3", hash_buckets=64)
    n_tok = feats.groupBy("id").agg(F.sum("cnt").alias("n"))
    # one manual logistic step is enough to separate the two templates:
    # positive grams only appear in good docs and vice versa
    y = {i: (1.0 if i < 8 else 0.0) for i in range(16)}
    rows = feats.collect()
    import collections

    w = collections.Counter()
    for r in rows:
        w[r["term"]] += (y[r["id"]] - 0.5) * r["cnt"]
    wdf = spark.createDataFrame(list(w.items()), "term string, weight double")
    from amanogawa_spark.operators.classifier import linear_classifier_scores

    # score with the subword featurizer via precomputed weights over the
    # same hashed vocabulary: reuse term_counts manually
    scored = (
        feats.join(F.broadcast(wdf), "term", "left")
        .groupBy("id")
        .agg(
            (F.sum(F.col("cnt") * F.coalesce("weight", F.lit(0.0))) / F.sum("cnt")).alias("s")
        )
        .collect()
    )
    s = {r["id"]: r["s"] for r in scored}
    assert min(s[i] for i in range(8)) > max(s[i] for i in range(8, 16))
