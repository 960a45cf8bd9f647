"""Deterministic distributed R-MAT graph generation (Chakrabarti, Zhan &
Faloutsos, SIAM SDM 2004 — the Graph500 generator family).

Why an engine needs this at 100 TB: every scale experiment in this repo
reads a parquet fixture, but a 10^12-edge stress graph is ~16 TB of
parquet before the first byte of actual work. R-MAT generation is pure
compute — edge k's endpoints derive from hash draws on (seed, k, level)
— so the edge table materializes directly inside the scan-less plan:
``spark.range(m)`` partitions the id space across every executor and the
whole recurrence runs in one zero-shuffle whole-stage-codegen projection.
Generating 10^12 edges needs no input I/O at all and scales exactly
linearly with cores.

Determinism contract: endpoints are a pure function of (seed, k, level)
via the same hash families the walk operators use (xxhash64 for the fast
path, md5 for the cross-engine oracle mirror), so the same call is
byte-identical across runs, partitionings, and cluster sizes.

The reference engine has no generator (it only consumes files,
`source/file.cpp`); this is engine-native test/bench infrastructure for
the 1000-executor story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _level_uniform(seed: int, level: int, hash: str):
    """Deterministic per-(edge, level) uniform in (0,1) from the edge's
    ``id`` column — u = (h32 + 0.5) / 2^32, same construction as
    :func:`amanogawa_spark.graph.walks._walk_uniform`."""
    if hash == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(
                            "~",
                            F.lit(str(seed)),
                            F.col("id").cast("string"),
                            F.lit(str(level)),
                        ),
                        "UTF-8",
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    else:
        h = F.xxhash64(F.lit(seed), "id", F.lit(level)).bitwiseAND(
            F.lit((1 << 32) - 1)
        )
    return (h + F.lit(0.5)) / F.lit(float(1 << 32))


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
    hash: str = "xxhash64",
    num_partitions: int | None = None,
) -> DataFrame:
    """(edge_id, src_id, dst_id) — ``edge_factor * 2^scale`` R-MAT edges
    over ``2^scale`` vertices.

    Edge k recursively picks one of the four adjacency-matrix quadrants
    (probabilities a, b, c, 1-a-b-c) at each of ``scale`` levels; the
    src/dst bit at each level is the quadrant's row/column half. Draws
    come from the (seed, k, level) hash only, so the output is invariant
    under repartitioning and identical at any parallelism. Self-loops and
    multi-edges are inherent to R-MAT and kept (``edge_id`` keeps rows
    unique); canonicalize with the existing edge-dedup operators when an
    experiment needs a simple graph.

    Scale: ONE projection over ``spark.range(m)`` — no shuffle, no input,
    O(scale) codegen'd expressions per row; 10^12 edges is just a bigger
    range split across executors.
    """
    if min(a, b, c) < 0.0 or max(a, b, c) > 1.0:
        # individually out-of-range probabilities (e.g. a=0.9, b=-0.2)
        # could pass the sum check yet invert the quadrant thresholds
        raise ValueError("rmat_edges: a, b, c must each be in [0, 1]")
    if not 0.0 < a + b + c <= 1.0:
        raise ValueError("rmat_edges: a+b+c must be in (0, 1]")
    m = edge_factor << scale
    t1, t2, t3 = a, a + b, a + b + c
    ids = spark.range(0, m, numPartitions=num_partitions)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        u = _level_uniform(seed, level, hash)
        weight = 1 << (scale - 1 - level)
        src_bit = F.when(u >= F.lit(t2), F.lit(1)).otherwise(F.lit(0))
        dst_bit = (
            F.when(u < F.lit(t2), F.when(u >= F.lit(t1), 1).otherwise(0))
            .otherwise(F.when(u >= F.lit(t3), 1).otherwise(0))
        )
        src = src + src_bit.cast("long") * F.lit(weight)
        dst = dst + dst_bit.cast("long") * F.lit(weight)
    return ids.select(
        F.col("id").alias("edge_id"),
        src.alias("src_id"),
        dst.alias("dst_id"),
    )


def rmat_sql(
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
) -> str:
    """DuckDB mirror of :func:`rmat_edges` with ``hash='md5'`` — the
    quadrant thresholds are emitted via ``repr`` of the SAME Python floats
    the Spark plan compares against, so both engines branch on identical
    doubles."""
    m = edge_factor << scale
    t1, t2, t3 = repr(a), repr(a + b), repr(a + b + c)
    u = (
        f"((('0x' || substr(md5('{seed}' || '~' || CAST(k AS VARCHAR) || '~' "
        f"|| CAST(l AS VARCHAR)), 1, 8))::BIGINT + 0.5) / 4294967296.0)"
    )
    return f"""
WITH ks AS (SELECT unnest(range(0, {m})) AS k),
lv AS (SELECT k, l, {u} AS u
  FROM ks, LATERAL unnest(range(0, {scale})) AS t(l)),
bits AS (SELECT k, l,
  CASE WHEN u >= {t2} THEN 1 ELSE 0 END AS sb,
  CASE WHEN u < {t2} THEN (CASE WHEN u >= {t1} THEN 1 ELSE 0 END)
       ELSE (CASE WHEN u >= {t3} THEN 1 ELSE 0 END) END AS db
  FROM lv)
SELECT k AS edge_id,
  CAST(SUM(sb * power(2, {scale} - 1 - l)) AS BIGINT) AS src_id,
  CAST(SUM(db * power(2, {scale} - 1 - l)) AS BIGINT) AS dst_id
FROM bits GROUP BY k"""
