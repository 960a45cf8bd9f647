"""Product quantization: training quality, encode/decode, ADC parity."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.operators.pq import (
    pq_adc_topk,
    pq_decode_expr,
    pq_encode,
    pq_train,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    """120 vectors in 3 well-separated clusters per subspace."""
    rng = random.Random(3)
    rows = []
    for i in range(120):
        base = [float(10 * (i % 3))] * 16
        rows.append((i, [b + rng.uniform(-0.5, 0.5) for b in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def _recon_err(df, books, rows):
    dec = pq_encode(df, books).withColumn(
        "rv", pq_decode_expr(F.col("codes"), books)
    )
    got = {r["id"]: r["rv"] for r in dec.collect()}
    truth = dict(rows)
    return sum(
        sum((a - b) ** 2 for a, b in zip(got[i], truth[i])) for i in truth
    ) / len(truth)


def test_train_reduces_reconstruction_error(spark, vec_df):
    df, rows = vec_df
    books0 = pq_train(df, m=4, k=4, max_iter=0)  # init only
    books = pq_train(df, m=4, k=4, max_iter=8)
    assert _recon_err(df, books, rows) <= _recon_err(df, books0, rows)
    # 3 separated clusters, 4 codes: per-dim error should be << cluster gap
    assert _recon_err(df, books, rows) < 16 * 1.0


def test_train_deterministic_under_repartition(spark, vec_df):
    """Invariant up to float-sum associativity in the centroid means
    (partial sums arrive in shuffle order) — same contract as kmeans."""
    df, _ = vec_df
    b1 = pq_train(df, m=4, k=4, max_iter=3)
    b2 = pq_train(df.repartition(7), m=4, k=4, max_iter=3)
    for s in range(4):
        for c in range(4):
            for a, b in zip(b1[s][c], b2[s][c]):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


def test_encode_shape_and_range(spark, vec_df):
    df, _ = vec_df
    books = pq_train(df, m=4, k=4, max_iter=3)
    enc = pq_encode(df, books).collect()
    assert len(enc) == 120
    for r in enc:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 4 for c in r["codes"])


def test_adc_matches_decoded_distance(spark, vec_df):
    """ADC distance must equal the exact distance to the DECODED vector
    (that is the ADC identity: sum of per-subspace query-to-centroid
    distances)."""
    df, rows = vec_df
    books = pq_train(df, m=4, k=4, max_iter=5)
    q = rows[7][1]
    out = pq_adc_topk(pq_encode(df, books), [(7, q)], books, k=10).collect()
    dec = {
        r["id"]: r["rv"]
        for r in pq_encode(df, books)
        .withColumn("rv", pq_decode_expr(F.col("codes"), books))
        .collect()
    }
    for r in out:
        exact = sum((a - b) ** 2 for a, b in zip(q, dec[r["id"]]))
        assert math.isclose(r["adist"], exact, rel_tol=1e-9, abs_tol=1e-9)
    # the query's own cluster dominates the top-k
    top_ids = [r["id"] for r in out]
    assert sum(1 for i in top_ids if i % 3 == 7 % 3) == len(top_ids)


def test_adc_no_shuffle_on_corpus_side(spark, vec_df):
    """Scoring is a map + bounded window — no cartesian on vectors, and
    the only join is the broadcast of the tiny query table."""
    df, rows = vec_df
    books = pq_train(df, m=4, k=4, max_iter=2)
    out = pq_adc_topk(pq_encode(df, books), [(0, rows[0][1])], books, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
