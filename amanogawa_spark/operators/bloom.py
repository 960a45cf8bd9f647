"""Distributed Bloom filter for crawl seen-sets.

A frontier at 10^12 URLs cannot afford an exact anti-join against the
full crawled set on every refresh; the standard crawler structure is a
Bloom filter over canonicalized URLs (false positives = a few URLs
never re-fetched, acceptable; false negatives = impossible). Built as
pure Catalyst: k md5-derived bit positions per key, ONE
map-side-combined ``bit_or`` aggregate over 60-bit words (60, not 64 —
``1 << 63`` flips the sign bit and engines disagree on overflow), so
the filter materializes as an O(m/60)-row word table that broadcasts
to probes. Membership is an explode + broadcast join + all-bits-set
aggregate.

Engine-portable by construction (md5 positions — the same trick as the
oracle-mode minhash/simhash), so the DuckDB oracle computes identical
filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 60


def _position(key: Column, i: int, m_bits: int) -> Column:
    """i-th bit position of a key: 60-bit md5 prefix mod m_bits."""
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat(F.lit(f"{i}:"), key), "UTF-8")), 1, 15),
        16,
        10,
    ).cast("long")
    return h % m_bits


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """(word_idx, word) sparse Bloom bitmap over ``df[key_col]``.

    Only non-zero words appear. Mergeable across batches: union two
    filters' word tables and re-aggregate with ``bit_or`` — the
    incremental crawl path (today's batch ∪ yesterday's filter).
    """
    key = F.col(key_col).cast("string")
    pos = df.select(
        F.explode(
            F.array(*[_position(key, i, m_bits) for i in range(k_hashes)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            # shiftleft's python binding takes only a literal shift — use
            # the SQL form for a column-valued shift amount
            F.expr(f"shiftleft(1L, cast(pos % {BITS_PER_WORD} as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two word tables built with identical (m_bits, k_hashes)."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


def bloom_contains(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """``df`` + boolean ``maybe_seen``: true iff ALL k positions are set.

    The word table rides a broadcast join (≤ m_bits/60 rows — a 2^30-bit
    production filter is ~140 MB of longs, still broadcastable; larger
    filters shard by ``word_idx % shards`` and probe per shard). False
    positives only: ``maybe_seen=false`` is a hard guarantee of novelty.
    """
    key = F.col(key_col).cast("string")
    probes = df.select(
        F.col(key_col),
        F.explode(
            F.array(*[_position(key, i, m_bits) for i in range(k_hashes)])
        ).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(pos % {BITS_PER_WORD} as int))").alias("mask"),
    )
    hit = probes.join(F.broadcast(bloom), "word_idx", "left").select(
        key_col,
        (
            F.col("word").isNotNull()
            & (F.col("word").bitwiseAND(F.col("mask")) == F.col("mask"))
        ).alias(
            "bit_set"
        ),
    )
    seen = hit.groupBy(key_col).agg(
        (F.sum(F.col("bit_set").cast("int")) == F.lit(k_hashes)).alias("maybe_seen")
    )
    return df.join(seen, key_col, "left").select(
        *df.columns, F.coalesce("maybe_seen", F.lit(False)).alias("maybe_seen")
    )
