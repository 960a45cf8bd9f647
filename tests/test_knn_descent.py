"""NN-Descent vs brute-force kNN: recall + determinism (reference nndescent.h)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(23)
    n, dim = 120, 10
    # clustered data so kNN structure is meaningful
    centers = rng.normal(size=(6, dim)) * 3
    data = np.vstack([centers[i % 6] + rng.normal(size=dim) for i in range(n)])
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, data


def _brute_topk(data: np.ndarray, k: int) -> dict[int, set[int]]:
    d = data.astype(np.float32).astype(np.float64)
    unit = d / np.linalg.norm(d, axis=1, keepdims=True)
    sims = unit @ unit.T
    out = {}
    for i in range(len(d)):
        order = sorted(
            (j for j in range(len(d)) if j != i), key=lambda j: (-sims[i, j], j)
        )
        out[i] = set(order[:k])
    return out


def test_nn_descent_recall(spark, vecs):
    from amanogawa_spark.graph.knn_descent import nn_descent

    df, data = vecs
    k = 5
    res = nn_descent(df, k=k, rho=1.0, max_epochs=6, seed=0)
    got: dict[int, set[int]] = {}
    for r in res.neighbors.collect():
        got.setdefault(r.id, set()).add(r.nbr)
    expected = _brute_topk(data, k)
    hits = sum(len(got.get(i, set()) & expected[i]) for i in expected)
    recall = hits / (len(expected) * k)
    assert recall >= 0.9, f"NN-Descent recall {recall}"
    assert res.epochs >= 1


def test_nn_descent_deterministic(spark, vecs):
    from amanogawa_spark.graph.knn_descent import nn_descent

    df, _ = vecs
    a = nn_descent(df, k=3, rho=0.5, max_epochs=2, seed=1)
    b = nn_descent(df.repartition(9), k=3, rho=0.5, max_epochs=2, seed=1)
    sa = {(r.id, r.nbr) for r in a.neighbors.collect()}
    sb = {(r.id, r.nbr) for r in b.neighbors.collect()}
    assert sa == sb


def test_nn_descent_graph_shape(spark, vecs):
    from amanogawa_spark.graph.knn_descent import nn_descent_knn_graph

    df, _ = vecs
    e = nn_descent_knn_graph(df, k=3, max_epochs=3)
    rows = e.collect()
    pairs = [(r.src_id, r.dst_id) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(s < d for s, d in pairs)
