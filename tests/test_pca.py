"""Algorithm oracles for distributed PCA (numpy mirrors)."""

from __future__ import annotations

import numpy as np
import pytest

from amanogawa_spark.operators.pca import (
    covariance_table,
    gram_stats,
    pca_fit,
    pca_project,
)


@pytest.fixture(scope="module")
def xdata():
    rng = np.random.default_rng(3)
    # anisotropic: strong first axis so ordering is unambiguous
    base = rng.normal(size=(120, 6)) * np.array([5.0, 2.0, 1.0, 0.5, 0.2, 0.1])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    return (base @ rot) + rng.normal(size=6)


@pytest.fixture(scope="module")
def xdf(spark, xdata):
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(xdata)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_gram_stats_match_numpy(xdf, xdata):
    row = gram_stats(xdf).collect()[0]
    assert row["n"] == len(xdata)
    assert np.allclose(row["s"], xdata.sum(axis=0))
    assert np.allclose(
        np.array(row["g"]).reshape(6, 6), xdata.T @ xdata, rtol=1e-12
    )


def test_covariance_matches_numpy(xdf, xdata):
    got = {(r["i"], r["j"]): r["cov"] for r in covariance_table(xdf).collect()}
    want = np.cov(xdata, rowvar=False, bias=True)
    for (i, j), v in got.items():
        assert abs(v - want[i][j]) < 2e-6
    assert len(got) == 6 * 7 // 2


def test_fit_matches_numpy_eigh(xdf, xdata):
    model = pca_fit(xdf, k=3)
    cov = np.cov(xdata, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    assert np.allclose(model.explained_variance, vals[order], rtol=1e-9)
    for r, col in enumerate(order):
        v = vecs[:, col]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        assert np.allclose(model.components[r], v, atol=1e-9)
    # components orthonormal
    assert np.allclose(model.components @ model.components.T, np.eye(3), atol=1e-9)
    assert model.explained_variance_ratio.sum() <= 1.0 + 1e-9


def test_project_matches_numpy_and_whitening_unit_variance(spark, xdf, xdata):
    model = pca_fit(xdf, k=3)
    got = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_project(xdf, model).collect()
    }
    want = (xdata - model.mean) @ model.components.T
    for i, row in enumerate(want):
        assert np.allclose(got[i], row, atol=1e-9)
    # projected variance equals the eigenvalues; whitening normalizes it
    proj = np.array([got[i] for i in range(len(xdata))])
    assert np.allclose(proj.var(axis=0), model.explained_variance, rtol=1e-6)
    white = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_project(xdf, model, whiten=True).collect()
    }
    wproj = np.array([white[i] for i in range(len(xdata))])
    assert np.allclose(wproj.var(axis=0), 1.0, rtol=1e-6)


def test_repartition_invariance(spark, xdf):
    a = covariance_table(xdf).collect()
    b = covariance_table(xdf.repartition(7)).collect()
    ka = {(r["i"], r["j"]): r["cov"] for r in a}
    kb = {(r["i"], r["j"]): r["cov"] for r in b}
    assert ka == kb  # rounded to 6 decimals in-query
