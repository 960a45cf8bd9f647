"""Unigram-LM tokenizer (operators/unigram.py) vs brute-force enumeration."""

from __future__ import annotations

import math

import pytest

from amanogawa_spark.operators.bpe import word_vocab
from amanogawa_spark.operators.unigram import (
    _forward_backward,
    _viterbi,
    candidate_pieces,
    corpus_loglik,
    expected_counts,
    seed_probs,
    unigram_encode,
    unigram_encode_words,
    unigram_train,
)

DOCS = [
    (0, "hello hello world"),
    (1, "low lower lowest hello"),
    (2, "new newer newest world  "),
    (3, None),
]


def _segmentations(word: str, pieces: set[str], klen: int):
    """All full segmentations of ``word`` into known pieces."""
    if not word:
        yield []
        return
    for l in range(1, min(klen, len(word)) + 1):
        if word[:l] in pieces:
            for rest in _segmentations(word[l:], pieces, klen):
                yield [word[:l]] + rest


def _brute_posterior(word: str, probs: dict[str, float], klen: int):
    segs = list(_segmentations(word, set(probs), klen))
    masses = [math.prod(probs[p] for p in s) for s in segs]
    z = sum(masses)
    exp: dict[str, float] = {}
    for s, m in zip(segs, masses):
        for p in s:
            exp[p] = exp.get(p, 0.0) + m / z
    return math.log(z), exp


def test_forward_backward_matches_enumeration():
    probs = {"h": 0.1, "e": 0.2, "l": 0.1, "o": 0.15, "he": 0.05,
             "ll": 0.08, "lo": 0.07, "hell": 0.02, "hello": 0.03}
    for word in ("hello", "hell", "loll", "oh"):
        ll, exp = _forward_backward(word, probs, 5)
        bll, bexp = _brute_posterior(word, probs, 5)
        assert ll == pytest.approx(bll, abs=1e-12)
        assert set(exp) == set(bexp)
        for p in bexp:
            assert exp[p] == pytest.approx(bexp[p], abs=1e-12)


def test_viterbi_matches_enumeration():
    probs = {"h": 0.1, "e": 0.2, "l": 0.1, "o": 0.15, "he": 0.05,
             "ll": 0.08, "lo": 0.07, "hello": 0.03}
    for word in ("hello", "helloo", "hell"):
        segs = list(_segmentations(word, set(probs), 5))
        best = max(sum(math.log(probs[p]) for p in s) for s in segs)
        pieces, score = _viterbi(
            word, {p: math.log(q) for p, q in probs.items()}, 5
        )
        assert score == pytest.approx(best, abs=1e-12)
        assert "".join(pieces) == word
    # unsegmentable word
    pieces, score = _viterbi("xyz", {"a": -1.0}, 5)
    assert pieces is None and score is None


def test_candidates_match_python_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    wc = {r["word"]: r["cnt"] for r in word_vocab(df).collect()}
    mirror: dict[str, int] = {}
    for w, c in wc.items():
        for s in range(len(w)):
            for l in range(1, min(4, len(w) - s) + 1):
                mirror[w[s : s + l]] = mirror.get(w[s : s + l], 0) + c
    mirror = {
        p: c for p, c in mirror.items() if c >= 2 or len(p) == 1
    }
    got = {
        r["piece"]: r["cnt"]
        for r in candidate_pieces(word_vocab(df), 4, 2).collect()
    }
    assert got == mirror


def test_em_monotone_loglik(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    wc = word_vocab(df).persist()
    probs = seed_probs(candidate_pieces(wc, 4, 2))
    prev = corpus_loglik(wc, probs, 4)
    for _ in range(3):
        rows = expected_counts(wc, probs, 4).collect()
        total = sum(r["expcnt"] for r in rows)
        probs = {r["piece"]: r["expcnt"] / total for r in rows if r["expcnt"] > 0}
        ll = corpus_loglik(wc, probs, 4)
        assert ll >= prev - 1e-9
        prev = ll
    wc.unpersist()


def test_expected_counts_match_driver_dp(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    wc = word_vocab(df).persist()
    probs = seed_probs(candidate_pieces(wc, 4, 2))
    got = {r["piece"]: r["expcnt"] for r in expected_counts(wc, probs, 4).collect()}
    mirror: dict[str, float] = {}
    for r in wc.collect():
        _, exp = _forward_backward(r["word"], probs, 4)
        for p, e in exp.items():
            mirror[p] = mirror.get(p, 0.0) + e * r["cnt"]
    wc.unpersist()
    assert set(got) == set(mirror)
    for p in mirror:
        assert got[p] == pytest.approx(mirror[p], abs=1e-9)


def test_train_encode_roundtrip_and_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = unigram_train(df, rounds=2, vocab_size=30, max_piece_len=4, min_count=2)
    assert abs(sum(model.values()) - 1.0) < 1e-9
    segs = unigram_encode_words(word_vocab(df).select("word"), model, 4)
    for r in segs.collect():
        assert "".join(r["pieces"]) == r["word"]
        assert r["n_pieces"] == len(r["pieces"])
    enc_a = {
        r["id"]: (r["n_words"], r["n_pieces"], r["total_logp"])
        for r in unigram_encode(df, model, 4).collect()
    }
    enc_b = {
        r["id"]: (r["n_words"], r["n_pieces"], r["total_logp"])
        for r in unigram_encode(df.repartition(5), model, 4).collect()
    }
    assert set(enc_a) == set(enc_b) == {0, 1, 2}
    for k in enc_a:
        assert enc_a[k][:2] == enc_b[k][:2]
        assert enc_a[k][2] == pytest.approx(enc_b[k][2], abs=1e-9)
    # doc 0: "hello hello world" -> 3 words
    assert enc_a[0][0] == 3
