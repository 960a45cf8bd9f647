"""Deterministic sampling for training-data curation.

Real corpus pipelines need reproducible subsets: "n docs per language",
"1% of pages per domain" — stable across reruns, partitionings, and
cluster sizes, so downstream training sees the identical corpus. Both
operators order rows by a pure per-row hash instead of RNG state:

- :func:`stratified_sample` — exactly n rows per group (top-n by hash
  inside each group; one hash shuffle + window, the bounded-k pattern).
- :func:`hash_sample` — keep each row independently with probability p
  (a filter — no shuffle at all; the per-row coin is the same trick as
  DOULION edge sampling in ``graph/triangles.py``).

``hash='md5'`` makes either engine-portable (DuckDB computes the same
hex), which is how the oracle queries value-check the sampled sets;
'xxhash64' is the cheaper JVM-codegen default for production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _row_hash(cols: list[str], hash: str, seed: int) -> Column:
    strs = [F.col(c).cast("string") for c in cols]
    if hash == "md5":
        return F.md5(F.encode(F.concat_ws("~", *strs), "UTF-8"))
    return F.xxhash64(*strs, F.lit(seed)).cast("string")


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_cols: list[str],
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by hash order.

    ``key_cols`` must identify a row (e.g. the primary key): the sample is
    then a pure function of the data — repartition/cluster-size invariant.
    The window's top-n short-circuits shuffle volume the same way every
    other bounded-k operator here does (rank > n rows never leave the
    partial sort).
    """
    h = _row_hash(key_cols, hash, seed)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def hash_sample(
    df: DataFrame,
    p: float,
    key_cols: list[str],
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Bernoulli(p) sample with a deterministic per-row coin — a pure
    filter (no shuffle, pushdown-friendly), reproducible anywhere."""
    if hash == "md5":
        strs = [F.col(c).cast("string") for c in key_cols]
        h32 = F.conv(
            F.substring(F.md5(F.encode(F.concat_ws("~", *strs), "UTF-8")), 1, 8),
            16,
            10,
        ).cast("long")
    else:
        h32 = F.xxhash64(*key_cols, F.lit(seed)).bitwiseAND(F.lit((1 << 32) - 1))
    return df.filter(h32 < int(p * (1 << 32)))
