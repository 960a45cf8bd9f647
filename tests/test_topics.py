"""PLSA fixed-round EM (operators/topics.py) vs a numpy mirror."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from amanogawa_spark.operators.topics import (
    doc_term_counts,
    perplexity,
    plsa,
    top_topic_terms,
)


def _hash_init(term: str, t: int) -> float:
    return 1.0 + int(hashlib.md5(f"{term}:{t}".encode()).hexdigest()[:8], 16) % 97


def _numpy_plsa(counts: dict[tuple[int, str], float], k: int, iters: int):
    docs = sorted({d for d, _ in counts})
    terms = sorted({w for _, w in counts})
    di = {d: i for i, d in enumerate(docs)}
    wi = {w: i for i, w in enumerate(terms)}
    n = np.zeros((len(docs), len(terms)))
    for (d, w), c in counts.items():
        n[di[d], wi[w]] = c
    theta = np.full((len(docs), k), 1.0 / k)
    phi = np.array([[_hash_init(w, t) for t in range(k)] for w in terms])
    for _ in range(iters):
        th_new = np.zeros_like(theta)
        ph_new = np.zeros_like(phi)
        for a in range(len(docs)):
            for b in range(len(terms)):
                if n[a, b] == 0:
                    continue
                r = theta[a] * phi[b]
                r = r / r.sum()
                th_new[a] += n[a, b] * r
                ph_new[b] += n[a, b] * r
        theta = th_new / th_new.sum(axis=1, keepdims=True)
        phi = ph_new / ph_new.sum(axis=0, keepdims=True)
    return docs, terms, theta, phi


def _rand_counts(seed: int, n_docs: int, vocab: int, fill: float):
    rng = random.Random(seed)
    counts = {}
    for d in range(n_docs):
        for w in range(vocab):
            if rng.random() < fill:
                counts[(d, f"w{w}")] = float(rng.randrange(1, 6))
    return counts


def _spark_counts(spark, counts):
    return spark.createDataFrame(
        [(d, w, c) for (d, w), c in counts.items()], "id long, term string, cnt double"
    )


def test_plsa_matches_numpy_fixed_rounds(spark):
    counts = _rand_counts(seed=4, n_docs=12, vocab=20, fill=0.4)
    theta_l, phi_l = plsa(_spark_counts(spark, counts), k=3, iterations=4)
    docs, terms, theta, phi = _numpy_plsa(counts, k=3, iters=4)
    got_t = {(r["id"], r["topic"]): r["p"] for r in theta_l.collect()}
    for a, d in enumerate(docs):
        for t in range(3):
            assert got_t[(d, t)] == pytest.approx(theta[a, t], abs=1e-9)
    got_p = {(r["term"], r["topic"]): r["p"] for r in phi_l.collect()}
    for b, w in enumerate(terms):
        for t in range(3):
            assert got_p[(w, t)] == pytest.approx(phi[b, t], abs=1e-9)


def test_plsa_perplexity_monotone_nonincreasing(spark):
    counts = _rand_counts(seed=9, n_docs=15, vocab=25, fill=0.35)
    cdf = _spark_counts(spark, counts).persist()
    prev = None
    for iters in (1, 3, 6):
        th, ph = plsa(cdf, k=3, iterations=iters)
        ppl = perplexity(cdf, th, ph)
        if prev is not None:
            assert ppl <= prev + 1e-9, (iters, ppl, prev)
        prev = ppl
    cdf.unpersist()


def test_plsa_recovers_planted_topics(spark):
    # two disjoint vocabularies; every doc draws from exactly one
    rows = []
    for d in range(20):
        src = 0 if d < 10 else 1
        for w in range(8):
            rows.append((d, f"t{src}_w{w}", 2.0))
    cdf = spark.createDataFrame(rows, "id long, term string, cnt double")
    th, ph = plsa(cdf, k=2, iterations=25)
    # each doc's dominant topic must be constant within a group and
    # differ across groups
    w = Window.partitionBy("id").orderBy(F.desc("p"))
    dom = {
        r["id"]: r["topic"]
        for r in th.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    g0 = {dom[d] for d in range(10)}
    g1 = {dom[d] for d in range(10, 20)}
    assert len(g0) == 1 and len(g1) == 1 and g0 != g1
    # top terms per topic stay inside the planted vocabulary
    tops = top_topic_terms(ph, n=5).collect()
    for r in tops:
        planted = g0 == {r["topic"]}
        assert r["term"].startswith("t0_" if planted else "t1_")


def test_doc_term_counts_and_invariance(spark):
    docs = spark.createDataFrame(
        [(1, "A  b b "), (2, "c a\tA")], "doc_id long, text string"
    )
    got = {
        (r["id"], r["term"]): r["cnt"] for r in doc_term_counts(docs).collect()
    }
    assert got == {(1, "a"): 1.0, (1, "b"): 2.0, (2, "c"): 1.0, (2, "a"): 2.0}
    counts = _rand_counts(seed=2, n_docs=8, vocab=12, fill=0.5)
    a_t, _ = plsa(_spark_counts(spark, counts), k=2, iterations=3)
    b_t, _ = plsa(_spark_counts(spark, counts).repartition(7), k=2, iterations=3)
    a = {(r["id"], r["topic"]): r["p"] for r in a_t.collect()}
    b = {(r["id"], r["topic"]): r["p"] for r in b_t.collect()}
    for key in a:
        assert a[key] == pytest.approx(b[key], abs=1e-9)
