"""HyperBall: per-vertex neighborhood-size estimation with HLL registers.

The scale path for distance-based centrality (Boldi & Vigna, 2013 —
"HyperBall: beyond 1.4 billion pairs"): each vertex carries an HLL
sketch of its out-ball B(v, t); one relaxation round unions every
neighbor's ball into it (register-wise max — HLL union is exact), so
after r rounds the sketch estimates |B(v, r)|. State is O(V · 2^p)
small integers however large the graph; each round is ONE edge join +
ONE (id, bucket) max-aggregate — shuffle-native, no per-pair
materialization (the exact form in
:mod:`amanogawa_spark.graph.centrality` is the verify baseline).

Registers use the engine-portable md5 scheme from
:mod:`amanogawa_spark.operators.sketch`, so a DuckDB oracle computing
the EXACT ball then sketching it reproduces these estimates
bit-for-bit — the estimate is a deterministic function of the ball set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.operators.sketch import _h32_md5, _rho


def hyperball_registers(
    vertices: DataFrame,
    edges: DataFrame,
    radius: int = 2,
    p: int = 6,
) -> DataFrame:
    """(id, bucket, rho) — HLL registers of each vertex's out-ball
    B(id, radius) = {id} ∪ {v : d(id → v) ≤ radius}.
    """
    tail_bits = 32 - p
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
    )

    def regs_of(member: F.Column) -> tuple[F.Column, F.Column]:
        h = _h32_md5(member)
        bucket = F.shiftright(h, tail_bits)
        tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
        return bucket, _rho(tail, tail_bits)

    b0, r0 = regs_of(F.col("id"))
    state = (
        vertices.select("id", b0.alias("bucket"), r0.alias("rho"))
        .groupBy("id", "bucket")
        .agg(F.max("rho").alias("rho"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for _ in range(radius):
        # u's next ball absorbs every out-neighbor w's current ball
        contrib = e.join(
            state.select(F.col("id").alias("dst_id"), "bucket", "rho"), "dst_id"
        ).select(F.col("src_id").alias("id"), "bucket", "rho")
        nxt = (
            state.unionAll(contrib)
            .groupBy("id", "bucket")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        nxt.count()
        state.unpersist()
        state = nxt
    return state


def hyperball_estimates(registers: DataFrame, p: int = 6) -> DataFrame:
    """(id, estimate) — per-vertex ball-size estimate from a register
    table (raw HLL estimator + small-range linear-counting correction,
    the grouped form of :func:`~amanogawa_spark.operators.sketch.hll_estimate`)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy("id").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
        F.count("*").alias("v_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("v_present"))
    zeros = F.lit(m) - F.col("v_present")
    raw = F.lit(alpha * m * m) / s
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select("id", corrected.alias("estimate"))


def hyperball(
    vertices: DataFrame, edges: DataFrame, radius: int = 2, p: int = 6
) -> DataFrame:
    """(id, estimate) — estimated |B(id, radius)| per vertex (incl. self)."""
    return hyperball_estimates(
        hyperball_registers(vertices, edges, radius, p), p
    )
