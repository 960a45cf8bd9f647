"""Distributed PCA over embedding columns.

The scale path for whitening / decorrelating embeddings ahead of ANN,
SemDeDup and IVF clustering: a d-dim corpus of any size reduces to one
(d + d²)-sized partial per map partition — the raw vectors are never
shuffled and never collected.

- :func:`gram_stats` — one ``mapInPandas`` pass emits per-partition
  (n, Σx, Σxxᵀ) partials (BLAS ``X.T @ X`` per Arrow batch, float64);
  a tiny posexplode + sum reduces them.  Shuffle volume: ~d² doubles
  per partition, independent of corpus size.
- :func:`covariance_table` — (i, j, cov) from the moment sums
  (population covariance, cov = (Σxy − ΣxΣy/n)/n) — the value-oracle
  surface: any SQL engine reproduces it from the raw table.
- :func:`pca_fit` — eigendecomposition of the d×d covariance on the
  driver (d ≤ a few thousand; the matrix is KB-MB scale however big
  the corpus).  Deterministic sign: each component's largest-|loading|
  coordinate is made positive.
- :func:`pca_project` — broadcast the (k×d) components in the closure,
  project per Arrow batch; optional whitening divides by √eigenvalue.

Reference scope: engine addition — the reference's similarity plugin
consumes raw BoW/doc vectors (src/amanogawa/plugin/flow/to_graph/
measure.h) with no decorrelation stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["PCAModel", "gram_stats", "covariance_table", "pca_fit", "pca_project"]


def gram_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row: (n long, s array<double> [d], g array<double> [d²,
    row-major Σ x xᵀ]) — the sufficient statistics for mean/covariance.

    One map pass (per-partition float64 BLAS accumulation) + one
    posexplode-sum reduce of the ≤ #partitions partial rows.
    """
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    partials = df.select(vec_col).mapInPandas(_partial, schema)
    # reduce: explode each partial's arrays to (pos, val), sum per pos,
    # reassemble — fully distributed, ≤ #partitions × d² tiny rows
    n_total = partials.agg(F.sum("n").alias("n"))
    s_sum = (
        partials.select(F.posexplode("s").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("a"))
        .select(F.transform("a", lambda e: e["v"]).alias("s"))
    )
    g_sum = (
        partials.select(F.posexplode("g").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("a"))
        .select(F.transform("a", lambda e: e["v"]).alias("g"))
    )
    return n_total.crossJoin(s_sum).crossJoin(g_sum)


def covariance_table(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, cov) for i ≤ j — population covariance entries, the
    engine-portable value surface ((Σxy − ΣxΣy/n)/n, float64)."""
    st = gram_stats(df, vec_col)
    d = F.size("s")
    entries = st.select(
        F.col("n").cast("double").alias("nn"),
        "s",
        "g",
        F.explode(F.sequence(F.lit(0), d - 1)).alias("i"),
        d.alias("d"),
    ).select(
        "nn",
        "s",
        "g",
        "i",
        F.explode(F.sequence(F.col("i"), F.col("d") - 1)).alias("j"),
    )
    sx = F.element_at("s", F.col("i").cast("int") + 1)
    sy = F.element_at("s", F.col("j").cast("int") + 1)
    sxy = F.element_at(
        "g", (F.col("i") * F.size("s") + F.col("j")).cast("int") + 1
    )
    return entries.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.round((sxy - sx * sy / F.col("nn")) / F.col("nn"), 6).alias("cov"),
    )


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    explained_variance_ratio: np.ndarray  # (k,)


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Fit PCA from one distributed moments pass; eigh on the driver
    over the d×d covariance (KB-MB whatever the corpus size)."""
    row = gram_stats(df, vec_col).collect()[0]
    n = float(row["n"])
    s = np.asarray(row["s"], dtype=np.float64)
    d = s.shape[0]
    g = np.asarray(row["g"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    # deterministic sign: largest-|loading| coordinate positive
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    ev = np.maximum(vals[order], 0.0)
    total = float(vals.clip(min=0.0).sum()) or 1.0
    return PCAModel(mean, comps, ev, ev / total)


def pca_project(
    df: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """(id_col, out_col array<double>) — project onto the model's
    components; components/mean ride the task closure (k×d floats),
    so the stage is map-only."""
    w = model.components.copy()
    if whiten:
        scale = np.sqrt(np.maximum(model.explained_variance, 1e-12))
        w = w / scale[:, None]
    mean = model.mean.copy()
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
        ]
    )

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            y = (x - mean) @ w.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: [r.tolist() for r in y]}
            )

    return df.select(id_col, vec_col).mapInPandas(_proj, schema)
