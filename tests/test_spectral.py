"""Fiedler vector / spectral bisection (graph/spectral.py)."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from amanogawa_spark.graph.spectral import (
    bisection_cut_summary,
    fiedler_vector,
    spectral_bisection,
)


def _planted_two_cluster(seed=5, n=40, p_in=0.45, p_out=0.03):
    """Two dense clusters, sparse bridge — ground-truth bisection is the
    cluster split."""
    rng = random.Random(seed)
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            same = (i < n // 2) == (j < n // 2)
            if rng.random() < (p_in if same else p_out):
                edges.append((i, j))
    # guarantee connectivity inside clusters and one bridge
    for i in range(n // 2 - 1):
        edges.append((i, i + 1))
        edges.append((n // 2 + i, n // 2 + i + 1))
    edges.append((0, n // 2))
    return n, sorted(set(edges))


def _numpy_fiedler(n, edges):
    a = np.zeros((n, n))
    for u, v in edges:
        a[u, v] = a[v, u] = 1.0
    d = a.sum(axis=1)
    inv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-12)), 0.0)
    m = inv[:, None] * a * inv[None, :]
    w, vecs = np.linalg.eigh(m)
    # second-largest eigenvalue's eigenvector
    return vecs[:, np.argsort(w)[-2]]


def test_fiedler_matches_numpy_eigh(spark):
    n, edges = _planted_two_cluster()
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    got = {r["id"]: r["f"] for r in fiedler_vector(v, e, iterations=80).collect()}
    gv = np.array([got[i] for i in range(n)])
    ref = _numpy_fiedler(n, edges)
    # align sign and scale (operator rescales by max|f|)
    ref = ref / np.max(np.abs(ref))
    if np.dot(gv, ref) < 0:
        ref = -ref
    assert float(np.max(np.abs(gv - ref))) < 5e-3


def test_spectral_bisection_recovers_planted_split(spark):
    n, edges = _planted_two_cluster()
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    sides = spectral_bisection(v, e, iterations=80)
    rows = {r["id"]: r["side"] for r in sides.collect()}
    left = {i for i in range(n) if rows[i] == 0}
    truth = set(range(n // 2))
    # either orientation
    agree = max(len(left & truth), len(left & (set(range(n)) - truth)))
    assert agree >= n // 2 - 2
    summ = bisection_cut_summary(e, sides).collect()[0]
    assert summ["size_0"] + summ["size_1"] == n
    assert abs(summ["size_0"] - summ["size_1"]) <= 1
    # planted cut is sparse: far under the ~50% a random split expects
    assert summ["cut_frac"] < 0.25


def test_fiedler_repartition_invariant_and_isolated_zero(spark):
    n, edges = _planted_two_cluster(seed=9, n=24)
    ids = list(range(n)) + [99]  # 99 isolated
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    a = {r["id"]: r["f"] for r in fiedler_vector(v, e, iterations=12).collect()}
    b = {
        r["id"]: r["f"]
        for r in fiedler_vector(
            v.repartition(7), e.repartition(5), iterations=12
        ).collect()
    }
    assert a[99] == 0.0
    # max-abs rescale (order-insensitive) ⇒ identical values across layouts
    for i in ids:
        assert abs(a[i] - b[i]) < 1e-12, i
