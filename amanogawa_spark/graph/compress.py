"""Boldi–Vigna-style adjacency compressibility profiling.

The WebGraph framework (Boldi & Vigna, "The WebGraph Framework I:
Compression Techniques", WWW 2004) stores each vertex's sorted
successor list as deltas — the first successor as a signed offset from
the source id, the rest as gaps — in instantaneous codes. At 10^12
pages the decision "can the edge table live in RAM per executor"
hinges on exactly this number, so the engine profiles it: per source,
the Elias-γ cost of the gap-encoded sorted adjacency (2·⌊log2 g⌋ + 1
bits per gap) against the raw 64-bit representation.

This is a PROFILE, not a codec — the engine's persisted layouts stay
parquet (whose own delta/dictionary encodings benefit from the same
sorted order, which is why :mod:`amanogawa_spark.graph.layout` sorts
within buckets). One sort-free shuffle: gaps come from a lag window
over (src, dst-sorted) partitions, bit costs are pure Catalyst
expressions, and the summary is a map-side-combined aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _gamma_bits(gap: F.Column) -> F.Column:
    """Elias-γ bit cost of a positive integer gap.

    ⌊log2 g⌋ computed as ``length(bin(g)) − 1`` — integer-exact on both
    Spark and DuckDB (a floating log2 can land an ulp under an exact
    power of two and flip the floor between engines).
    """
    return 2 * (F.length(F.bin(gap.cast("long"))) - 1) + 1


def adjacency_gap_bits(edges: DataFrame) -> DataFrame:
    """(src_id, n_links, gamma_bits, raw_bits, bits_per_link) per source.

    The first successor is encoded as ``dst + 1`` (shifted to stay
    positive — the sign-vs-source refinement of BV §3 changes constants,
    not asymptotics), subsequent successors as ``dst − prev(dst)``.
    ``raw_bits`` is the uncompressed 64-bit-per-successor cost.
    """
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
    )
    w = Window.partitionBy("src_id").orderBy("dst_id")
    # try_subtract/try_add: full-range hash ids (xxhash64) can span more
    # than 2^63, overflowing the ANSI subtraction; an overflowed gap (or
    # first-successor shift) costs the worst case — 64 raw bits' γ ≈ 127
    gaps = e.withColumn("prev", F.lag("dst_id").over(w)).select(
        "src_id",
        F.coalesce(
            F.when(
                F.col("prev").isNull(),
                F.try_add(F.col("dst_id"), F.lit(1)),
            ).otherwise(F.try_subtract(F.col("dst_id"), F.col("prev"))),
            F.lit((1 << 62) - 1).cast("long"),
        ).alias("gap"),
    )
    return (
        gaps.groupBy("src_id")
        .agg(
            F.count("*").alias("n_links"),
            F.sum(_gamma_bits(F.col("gap"))).cast("long").alias("gamma_bits"),
        )
        .select(
            "src_id",
            "n_links",
            "gamma_bits",
            (F.col("n_links") * F.lit(64)).alias("raw_bits"),
            F.round(F.col("gamma_bits") / F.col("n_links"), 6).alias("bits_per_link"),
        )
    )


def compression_summary(edges: DataFrame) -> DataFrame:
    """One row: corpus-level gap-compression profile.

    (n_sources, n_links, gamma_bits, raw_bits, bits_per_link,
    compression_ratio) — the number a capacity plan reads.
    """
    per_src = adjacency_gap_bits(edges)
    return per_src.agg(
        F.count("*").alias("n_sources"),
        F.sum("n_links").alias("n_links"),
        F.sum("gamma_bits").alias("gamma_bits"),
        F.sum("raw_bits").alias("raw_bits"),
        F.round(F.sum("gamma_bits") / F.sum("n_links"), 6).alias("bits_per_link"),
        F.round(F.sum("gamma_bits") / F.sum("raw_bits"), 6).alias(
            "compression_ratio"
        ),
    )
