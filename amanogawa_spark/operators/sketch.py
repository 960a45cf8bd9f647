"""Distinct-count sketching — HyperLogLog with engine-portable registers.

``approx_count_distinct`` answers the question but its HLL++ registers
are an implementation detail: no other engine reproduces them, so the
result can only ever be range-checked. This module builds the classic
HLL (Flajolet et al. 2007) from an md5-derived 32-bit hash with the
register math in exact integer arithmetic (the leading-zero count is a
comparison chain, not float log2), so DuckDB computes bit-identical
registers and the estimate verifies by VALUE — the same portability
trick the minhash/simhash oracles use.

Scale shape: ONE map-side-combined aggregate over (bucket → max rho) —
2^p partial rows per task regardless of input size — then a single-row
reduction for the estimate. The register table is also the mergeable
form: union two register tables and re-take max(rho) to combine sketches
across days/shards (tested).

Default ``p=12`` (4096 registers): ~1.6% standard error, fine for
domain-count / vocabulary-size curation stats at any corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h32_md5(col: Column) -> Column:
    return F.conv(
        F.substring(F.md5(F.encode(col.cast("string"), "UTF-8")), 1, 8), 16, 10
    ).cast("long")


def _rho(tail: Column, tail_bits: int) -> Column:
    """Position of the first 1-bit in a tail_bits-wide integer (1-based);
    tail_bits+1 when zero. Exact integer comparisons — no float log."""
    # right fold: the smallest k whose threshold matches wins, i.e.
    # tail >= 2^(tail_bits-k) ⟹ first 1-bit at position k
    expr = F.lit(tail_bits + 1)
    for k in range(tail_bits, 0, -1):
        expr = F.when(tail >= (1 << (tail_bits - k)), F.lit(k)).otherwise(expr)
    return expr


def hll_registers(
    df: DataFrame, col: str, p: int = 12
) -> DataFrame:
    """(bucket, rho) — the sketch's register table (only non-empty
    buckets; absent bucket ⟺ rho 0). Mergeable: union + groupBy
    max(rho)."""
    tail_bits = 32 - p
    h = _h32_md5(F.col(col))
    bucket = F.shiftright(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    return (
        df.select(
            bucket.alias("bucket"), _rho(tail, tail_bits).alias("r")
        )
        .groupBy("bucket")
        .agg(F.max("r").cast("long").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Combine sketches (e.g. per-day shards): union + max per bucket."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionAll(t)
    return out.groupBy("bucket").agg(F.max("rho").cast("long").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """One row (estimate double) from a register table. Raw HLL estimator
    with the small-range linear-counting correction (Flajolet §4)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
        F.count("*").alias("v_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("v_present"))  # empty buckets add 2^0
    zeros = F.lit(m) - F.col("v_present")
    raw = F.lit(alpha * m * m) / s
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(corrected.alias("estimate"))


def hll_distinct(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """One row (estimate double) — approximate COUNT(DISTINCT col)."""
    return hll_estimate(hll_registers(df, col, p), p)


# ---------------------------------------------------------------------------
# Count-min sketch — frequency estimates / heavy-hitter screening
# ---------------------------------------------------------------------------

def _cms_bucket(col: Column, row: int, w: int) -> Column:
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(F.concat_ws("~", F.lit(str(row)), col.cast("string")), "UTF-8")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h % w


def cms_registers(
    df: DataFrame, col: str, d: int = 4, w: int = 2048
) -> DataFrame:
    """(row, bucket, cnt) — the count-min table (Cormode & Muthukrishnan
    2005): ``d`` independent md5 hash rows of ``w`` counters. ONE
    map-side-combined aggregate over d·w bounded partials per task; the
    register table merges across shards by summing cnt. Point estimates
    overcount (never undercount) by at most eps·N with prob 1-delta for
    w=e/eps, d=ln(1/delta)."""
    c = F.col(col)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _cms_bucket(c, i, w).alias("bucket"))
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(*register_tables: DataFrame) -> DataFrame:
    """Combine shard sketches by summing counters."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionAll(t)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_query(
    registers: DataFrame,
    items: DataFrame,
    col: str,
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(col, est) — frequency upper-bound per item: min over the d rows'
    counters. The register side is tiny (≤ d·w rows) and broadcasts;
    the item side never shuffles."""
    c = F.col(col)
    keyed = items.select(
        c,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_bucket(c, i, w).alias("bucket")
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb"),
    ).select(col, "rb.row", "rb.bucket")
    return (
        keyed.join(F.broadcast(registers), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def hll_registers_by(
    df: DataFrame, group_col: str, col: str, p: int = 12
) -> DataFrame:
    """(group, bucket, rho) — one HLL register table PER GROUP (e.g. a
    sketch of distinct URLs per host). One map-side-combined aggregate;
    at most m=2^p rows per group regardless of group size, so hub groups
    cost the same as tiny ones. Mergeable across shards with
    union + groupBy(group, bucket) max(rho)."""
    tail_bits = 32 - p
    h = _h32_md5(F.col(col))
    bucket = F.shiftright(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    return (
        df.select(
            F.col(group_col).alias("grp"),
            bucket.alias("bucket"),
            _rho(tail, tail_bits).alias("r"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("r").cast("long").alias("rho"))
    )


def hll_distinct_by(
    df: DataFrame, group_col: str, col: str, p: int = 12
) -> DataFrame:
    """(group, estimate) — approximate COUNT(DISTINCT col) GROUP BY
    group_col in ONE pass with bounded memory per group.

    The exact groupBy(grp).agg(countDistinct(col)) shuffles every
    distinct (grp, col) pair; this shuffles ≤ 2^p register rows per
    group — the profiling shape for "distinct pages per host" over
    10^12 rows. Same raw-HLL + linear-counting estimator as
    :func:`hll_estimate`, applied per group."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers_by(df, group_col, col, p)
    agg = regs.groupBy("grp").agg(
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
    return agg.select(F.col("grp").alias(group_col), corrected.alias("estimate"))


def hll_overlap(
    regs_a: DataFrame, regs_b: DataFrame, p: int = 12
) -> DataFrame:
    """One row (est_a, est_b, est_union, est_intersection, jaccard) —
    set-overlap estimate between two HLL sketches by inclusion-exclusion:
    |A∩B| ≈ |A| + |B| − |A∪B|, where the union sketch is the register-wise
    max (exact for HLL — sketch(A∪B) == merge(sketch(A), sketch(B))).

    The cross-crawl profiling shape: "how many URLs did snapshot B re-see
    from snapshot A?" over 10^12-row crawls costs three O(2^p) register
    tables and three 1-row aggregates — the raw url sets never co-shuffle.
    Intersection error grows as the true overlap shrinks relative to the
    union (standard HLL inclusion-exclusion behavior); the estimate is
    clamped at 0 so disjoint sets can't go negative. Jaccard is
    est_intersection / est_union (0 when the union estimate is 0).
    """

    def _est(regs: DataFrame, name: str) -> DataFrame:
        return hll_estimate(regs, p).select(F.col("estimate").alias(name))

    union = hll_merge(regs_a, regs_b)
    a = _est(regs_a, "est_a")
    b = _est(regs_b, "est_b")
    u = _est(union, "est_union")
    row = a.crossJoin(b).crossJoin(u)  # three 1-row frames
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
    )
    return row.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.when(F.col("est_union") > 0, inter / F.col("est_union"))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )
