"""Explicit skew handling for hub vertices (SURVEY.md §4.2).

Web graphs are Zipf: a handful of hub pages receive a large share of all
in-links, so any ``groupBy(dst_id)`` or join on ``dst_id`` concentrates
those rows on one reducer. Two tools on top of AQE's skew-join:

- :func:`salted_group_sum` — two-level aggregation: partial sums over
  ``(key, salt)`` then final sum over ``key``. The partial level fans the
  hot key across ``salt_factor`` reducers.
- :func:`hot_keys` — degree-histogram-driven detection of keys above a
  frequency threshold, used to decide salt factors and to split joins
  into broadcast(hot) + shuffle(cold) legs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys appearing more than ``threshold`` times — the salting candidates."""
    return df.groupBy(key).agg(F.count("*").alias("n")).filter(F.col("n") > threshold)


def auto_salt_factor(
    df: DataFrame,
    key: str,
    target_per_reducer: int = 1_000_000,
    sample_fraction: float | None = None,
    max_factor: int = 1024,
) -> int:
    """Pick the salt factor from the key-frequency histogram (SURVEY §4.2:
    "the degree histogram job decides the salt factor").

    ceil(max_key_frequency / target_per_reducer), clamped to
    [1, max_factor]: the hottest key's rows land on that many partial
    reducers, so no reducer sees more than ~target_per_reducer of them.
    ``sample_fraction`` trades one exact counting pass for a Bernoulli
    sample (frequencies scale by 1/fraction) — at 10^12 edges the exact
    histogram is itself a full shuffle, and the salt factor only needs
    order-of-magnitude accuracy.
    """
    import math

    src = df.sample(fraction=sample_fraction, seed=7) if sample_fraction else df
    row = (
        src.groupBy(key)
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]
    )
    mx = row["mx"] or 0
    if sample_fraction:
        mx = int(mx / sample_fraction)
    return max(1, min(max_factor, math.ceil(mx / target_per_reducer)))


def salted_group_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    out_name: str,
    salt_factor: int | str = 16,
    target_per_reducer: int = 1_000_000,
) -> DataFrame:
    """``df.groupBy(key).sum(value)`` with a two-level salted aggregate.

    Level 1 groups on (key, salt) — the hot key's rows spread over
    ``salt_factor`` partial reducers; level 2 sums the partials per key.
    Identical result to the direct aggregate (sum is commutative), but
    bounded per-reducer fan-in.

    ``salt_factor='auto'`` runs the degree-histogram job first
    (:func:`auto_salt_factor`): ceil(max_freq / target_per_reducer),
    so a uniform key distribution degenerates gracefully to factor 1
    (one aggregation level, no extra shuffle width) while a Zipf hub
    fans out exactly as wide as needed.

    Note: Spark's hash aggregate already does map-side partials, which
    covers mild skew; this helps when a single key's *post-partial* row
    count still dominates (e.g. millions of map tasks all feeding one hub).
    """
    if salt_factor == "auto":
        salt_factor = auto_salt_factor(df, key, target_per_reducer)
    value_col = F.col(value) if isinstance(value, str) else value
    salt = (F.xxhash64(F.monotonically_increasing_id()) % salt_factor).alias("_salt")
    partial = (
        df.select(F.col(key), value_col.alias("_v"), salt)
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(out_name))


def split_hot_cold_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot: DataFrame,
) -> DataFrame:
    """Join where ``hot`` keys take a broadcast leg and the rest shuffle.

    ``hot`` is a small DataFrame of hot key values (from :func:`hot_keys`).
    The right-side rows for hot keys are broadcast, so the skewed key never
    lands on a single shuffle reducer; cold keys use the normal shuffle join.
    """
    hot_b = F.broadcast(hot.select(key))
    left_hot = left.join(hot_b, key, "left_semi")
    left_cold = left.join(hot_b, key, "left_anti")
    right_hot = right.join(hot_b, key, "left_semi")
    right_cold = right.join(hot_b, key, "left_anti")
    return left_hot.join(F.broadcast(right_hot), key).unionByName(
        left_cold.join(right_cold, key)
    )
