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


def salted_group_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    out_name: str,
    salt_factor: int = 16,
) -> DataFrame:
    """``df.groupBy(key).sum(value)`` with a two-level salted aggregate.

    Level 1 groups on (key, salt) — the hot key's rows spread over
    ``salt_factor`` partial reducers; level 2 sums the partials per key.
    Identical result to the direct aggregate (sum is commutative), but
    bounded per-reducer fan-in.

    Note: Spark's hash aggregate already does map-side partials, which
    covers mild skew; this helps when a single key's *post-partial* row
    count still dominates (e.g. millions of map tasks all feeding one hub).
    """
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
