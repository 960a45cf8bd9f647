"""Algorithm oracles for the embedding pair-similarity histogram."""

from __future__ import annotations

import numpy as np

from amanogawa_spark.operators.similarity import embedding_pair_histogram


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_matches_numpy_mirror_within_buckets(spark):
    import hashlib

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(60, 8))
    n_buckets, bins = 5, 20
    df = _df(spark, vecs)
    got = {r["bin"]: r["n_pairs"] for r in
           embedding_pair_histogram(df, n_buckets=n_buckets, bins=bins, hash="md5").collect()}

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_buckets

    want: dict[int, int] = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if bucket(i) != bucket(j):
                continue
            c = float(vecs[i] @ vecs[j] / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j])))
            b = min(int(np.floor((c + 1.0) / 2.0 * bins)), bins - 1)
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_identical_vectors_land_in_top_bin(spark):
    v = [1.0, 2.0, 3.0]
    df = _df(spark, [v] * 6)
    rows = embedding_pair_histogram(df, n_buckets=1, bins=20).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 19
    assert rows[0]["n_pairs"] == 15  # C(6,2), all cosine == 1.0 (clamped bin)


def test_repartition_invariance(spark):
    rng = np.random.default_rng(9)
    df = _df(spark, rng.normal(size=(40, 6)))
    a = {(r["bin"], r["n_pairs"]) for r in embedding_pair_histogram(df, n_buckets=4).collect()}
    b = {
        (r["bin"], r["n_pairs"])
        for r in embedding_pair_histogram(df.repartition(7), n_buckets=4).collect()
    }
    assert a == b
