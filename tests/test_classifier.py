"""Linear text classifier apply (operators/classifier.py)."""

from __future__ import annotations

import math

import pytest

from amanogawa_spark.operators.classifier import (
    classifier_filter,
    linear_classifier_scores,
)

DOCS = [
    (0, "good good text"),
    (1, "bad bad bad"),
    (2, "unknown tokens only"),
    (3, "good bad"),
]
WEIGHTS = [("good", 2.0), ("bad", -2.0)]


def _score(toks, w, b=0.0):
    tf = {t: toks.count(t) for t in set(toks)}
    n = len(toks)
    logit = b + sum(c * w.get(t, 0.0) for t, c in tf.items()) / n
    return 1.0 / (1.0 + math.exp(-logit))


def test_scores_match_hand_mirror(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    w = spark.createDataFrame(WEIGHTS, ["term", "weight"])
    got = {r["id"]: (r["n_tokens"], r["score_r"]) for r in
           linear_classifier_scores(df, w, bias=0.1).collect()}
    wd = dict(WEIGHTS)
    for did, text in DOCS:
        toks = text.split()
        assert got[did][0] == len(toks)
        assert got[did][1] == pytest.approx(_score(toks, wd, 0.1), abs=1e-8)
    # OOV-only doc scores sigmoid(bias)
    assert got[2][1] == pytest.approx(1 / (1 + math.exp(-0.1)), abs=1e-8)


def test_filter_gates_on_threshold(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    w = spark.createDataFrame(WEIGHTS, ["term", "weight"])
    kept = {r["doc_id"] for r in classifier_filter(df, w, threshold=0.6).collect()}
    assert 0 in kept and 1 not in kept  # all-good in, all-bad out


def test_repartition_invariant(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    w = spark.createDataFrame(WEIGHTS, ["term", "weight"])
    a = linear_classifier_scores(df, w)
    b = linear_classifier_scores(df.repartition(7), w)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
