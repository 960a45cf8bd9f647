"""Interpolated bigram LM scores (operators/bow.py bigram_logprob_scores)."""

from __future__ import annotations

import math

import pytest

from amanogawa_spark.operators.bow import bigram_logprob_scores

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat"),
    (2, "mat the on sat cat the"),  # same unigrams as doc 0, scrambled order
    (3, "solo"),  # 1 token: no bigrams, no output row
    (4, None),
]


def _mirror(lam=0.75):
    toks = {i: t.lower().split() for i, t in DOCS if t}
    uni: dict[str, int] = {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
    tt, vv = sum(uni.values()), len(uni)
    bi: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = {}
    for i, ts in toks.items():
        lps = [
            math.log(lam * bi[(a, b)] / uni[a] + (1 - lam) * (uni[b] + 1) / (tt + vv))
            for a, b in zip(ts, ts[1:])
        ]
        if lps:
            out[i] = (len(lps), sum(lps) / len(lps))
    return out


def test_bigram_scores_match_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob_scores(df).collect()
    }
    want = _mirror()
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12)


def test_word_order_sensitivity(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["id"]: r["avg_logprob"] for r in bigram_logprob_scores(df).collect()}
    # doc 0 repeats corpus-frequent bigrams; its scramble (doc 2) must
    # score strictly lower despite identical unigram content
    assert got[0] > got[2]


def test_short_and_null_docs_absent(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ids = {r["id"] for r in bigram_logprob_scores(df).collect()}
    assert 3 not in ids and 4 not in ids
