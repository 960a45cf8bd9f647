"""Streaming distribution-drift monitoring: per-window PSI of a numeric
column against a FROZEN baseline histogram.

The online counterpart of ``operators/drift.py``: a crawl/ingest pipeline
watches quality scores, doc lengths, or latency values as they arrive and
alarms when a window's distribution departs from the frozen baseline
(PSI > 0.2 is the conventional investigate line).

Shape: ONE watermarked stateful aggregation in the stream (per-window
bin counts — state is O(windows × bins), bounded by the watermark), then
the PSI arithmetic runs as a BATCH post-aggregation over that tiny
table (:func:`window_psi`). Chaining a second aggregation inside the
stream would need multi-stateful-operator support and buys nothing: the
per-window bin table is O(bins) rows per window at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amanogawa_spark.operators.drift import _bin_of
from amanogawa_spark.streaming.events import EVENTS_SCHEMA


def baseline_bins(df: DataFrame, col: str, breaks: list[float]) -> DataFrame:
    """(bin, n_b) — the frozen baseline histogram over ``breaks`` (bin 0 =
    underflow, len(breaks) = overflow; every bin present, zero-filled).
    Compute once on the reference corpus and persist/broadcast."""
    n_bins = len(breaks) + 1
    spark = df.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(_bin_of(F.col(col), breaks).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_b"))
    )
    return grid.join(counts, "bin", "left").select(
        "bin", F.coalesce("n_b", F.lit(0)).alias("n_b")
    )


def streaming_bin_counts(
    spark: SparkSession,
    path: str,
    col: str = "value",
    breaks: list[float] | None = None,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming (window_start, window_end, bin, n) — watermarked windowed
    histogram of ``col`` over the events parquet stream; feed the sink
    table to :func:`window_psi`."""
    breaks = breaks if breaks is not None else [0.0]
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return (
        stream.filter(F.col(col).isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), _bin_of(F.col(col), breaks).alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "bin",
            "n",
        )
    )


def window_psi(
    bin_counts: DataFrame,
    baseline: DataFrame,
    breaks: list[float],
    smoothing: float = 0.5,
) -> DataFrame:
    """(window_start, window_end, n, psi_r) — per-window PSI vs the frozen
    ``baseline`` ((bin, n_b), from :func:`baseline_bins`). Batch
    post-aggregation over the per-window bin table; Laplace ``smoothing``
    keeps empty bins finite, identically to ``operators/drift.psi_bins``."""
    n_bins = len(breaks) + 1
    s = float(smoothing)
    spark = bin_counts.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    # rename before re-joining: a distinct-projection of the same frame
    # shares attribute ids with it, and the self-join would be ambiguous
    counts = bin_counts.select(
        F.col("window_start").alias("ws"),
        F.col("window_end").alias("we"),
        "bin",
        "n",
    )
    windows = counts.select("ws", "we").distinct()
    full = (
        windows.crossJoin(F.broadcast(grid))
        .join(counts, ["ws", "we", "bin"], "left")
        .select(
            F.col("ws").alias("window_start"),
            F.col("we").alias("window_end"),
            "bin",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .join(F.broadcast(baseline), "bin")
    )
    tb = baseline.agg(F.sum("n_b")).collect()[0][0] or 0
    pb = (F.col("n_b") + F.lit(s)) / F.lit(float(tb) + s * n_bins)
    win_tot = full.groupBy("window_start", "window_end").agg(
        F.sum("n").alias("n_w")
    )
    j = full.join(win_tot, ["window_start", "window_end"])
    pa = (F.col("n") + F.lit(s)) / (F.col("n_w") + F.lit(s * n_bins))
    return (
        j.select(
            "window_start",
            "window_end",
            "n_w",
            ((pa - pb) * F.log(pa / pb)).alias("term"),
        )
        .groupBy("window_start", "window_end")
        .agg(
            F.max("n_w").cast("long").alias("n"),
            F.round(F.sum("term"), 8).alias("psi_r"),
        )
    )
