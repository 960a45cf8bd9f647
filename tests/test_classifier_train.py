"""Algorithm oracles for in-engine linear-classifier training."""

from __future__ import annotations

import numpy as np


def _mk_docs(spark):
    good = ["quality reference article text prose", "reference article prose text"]
    spam = ["buy now click here cheap", "click buy cheap now now"]
    rows = []
    for i in range(40):
        t = good[i % 2] if i % 2 == 0 else spam[i % 2]
        rows.append((i, t, i % 2))  # label 0 = good docs, 1 = spam
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, label int"
    )
    return docs, labels


def test_train_matches_numpy_mirror(spark):
    """3 GD rounds == the literal numpy implementation of the same
    rounded-trajectory updates (1e-9)."""
    from amanogawa_spark.operators.classifier import classifier_train

    docs, labels = _mk_docs(spark)
    weights, bias = classifier_train(docs, labels, rounds=3, lr=0.5)
    got = {r["term"]: r["weight"] for r in weights.collect()}

    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    y = {r["doc_id"]: float(r["label"]) for r in labels.collect()}
    xs = {}  # id -> {term: tf/n}
    for i, t in rows:
        toks = t.lower().split()
        n = len(toks)
        d = {}
        for tk in toks:
            d[tk] = d.get(tk, 0) + 1
        xs[i] = {k: v / n for k, v in d.items()}
    vocab = sorted({t for d in xs.values() for t in d})
    w = {t: 0.0 for t in vocab}
    b = 0.0
    N = len(xs)
    for _ in range(3):
        errs = {}
        for i, d in xs.items():
            logit = b + sum(v * w[t] for t, v in d.items())
            errs[i] = round(1.0 / (1.0 + np.exp(-logit)) - y[i], 12)
        g = {t: 0.0 for t in vocab}
        for i, d in xs.items():
            for t, v in d.items():
                g[t] += errs[i] * v
        for t in vocab:
            w[t] = round(w[t] - 0.5 * round(g[t] / N, 12), 12)
        b = round(b - 0.5 * round(sum(errs.values()) / N, 12), 12)
    assert set(got) == set(vocab)
    for t in vocab:
        assert abs(got[t] - w[t]) < 1e-9, t
    assert abs(bias - b) < 1e-9


def test_train_separates_classes_end_to_end(spark):
    """Trained weights drive the existing inference to a clean split and
    classifier_filter keeps the high-scoring class."""
    from amanogawa_spark.operators.classifier import (
        classifier_filter,
        classifier_train,
        linear_classifier_scores,
    )

    docs, labels = _mk_docs(spark)
    weights, bias = classifier_train(docs, labels, rounds=40, lr=2.0)
    scores = {
        r["id"]: r["score_r"]
        for r in linear_classifier_scores(docs, weights, bias=bias).collect()
    }
    spam = [scores[i] for i in scores if i % 2 == 1]
    good = [scores[i] for i in scores if i % 2 == 0]
    assert min(spam) > max(good)  # label 1 = spam scores higher
    kept = classifier_filter(docs, weights, threshold=0.5, bias=bias)
    assert {r["doc_id"] % 2 for r in kept.collect()} == {1}


def test_train_repartition_invariant(spark):
    from amanogawa_spark.operators.classifier import classifier_train

    docs, labels = _mk_docs(spark)
    w1, b1 = classifier_train(docs, labels, rounds=2, lr=0.5)
    w2, b2 = classifier_train(docs.repartition(7), labels, rounds=2, lr=0.5)
    a = {r["term"]: r["weight"] for r in w1.collect()}
    c = {r["term"]: r["weight"] for r in w2.collect()}
    assert a == c and b1 == b2
