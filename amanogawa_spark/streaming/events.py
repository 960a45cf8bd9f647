"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.7) — this module is the
engine's forward-looking stream path: incremental page/edge ingestion as
micro-batches with watermarked event-time windows, so the same graph
tables can be appended continuously on a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_event_counts(
    spark: SparkSession,
    path: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed counts over a parquet-directory stream.

    Returns the streaming DataFrame; caller attaches a sink. For tests the
    memory sink + ``processAllAvailable`` drives it synchronously.
    """
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_once(df: DataFrame, query_name: str = "stream_out"):
    """Drive a streaming DF to completion over currently-available input."""
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return query_name
