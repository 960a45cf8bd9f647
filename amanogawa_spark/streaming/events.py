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


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "session_start double, last_ts double, n_events long"


def streaming_sessionize(
    spark: SparkSession, path: str, gap_seconds: int = 1800
) -> DataFrame:
    """Custom stateful operator: per-user sessionization over an event stream
    via ``applyInPandasWithState`` — the Spark-native replacement for a
    hand-written stateful plugin. A session closes when the gap between
    consecutive events exceeds ``gap_seconds``; only CLOSED sessions are
    emitted (append mode), the open tail lives in the state store and
    survives micro-batches. Deterministic (no processing-time timeouts):
    closure is driven purely by event timestamps.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)

    def fn(key, pdf_iter, state: GroupState):
        ts: list[float] = []
        for pdf in pdf_iter:
            ts.extend(t.timestamp() for t in pdf["ts"])
        ts.sort()
        if state.exists:
            s_start, s_last, s_n = state.get
        else:
            s_start = s_last = None
            s_n = 0
        closed = []
        for t in ts:
            if s_start is None:
                s_start, s_last, s_n = t, t, 1
            elif t - s_last > gap_seconds:
                closed.append((s_start, s_last, s_n))
                s_start, s_last, s_n = t, t, 1
            else:
                s_last = max(s_last, t)
                s_n += 1
        if s_start is not None:
            state.update((float(s_start), float(s_last), int(s_n)))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="s") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="s") for c in closed],
                    "n_events": [int(c[2]) for c in closed],
                }
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def streaming_dedup_exact(
    spark: SparkSession,
    path: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first-seen doc per content fingerprint wins.

    ``dropDuplicatesWithinWatermark`` on the 128-bit fingerprint is the
    formulation whose state store is actually bounded: Spark evicts a
    fingerprint's state once the watermark passes the event time at which
    it was first seen, so state is O(docs-per-watermark-window), not
    O(corpus). (Plain ``dropDuplicates(["dup_key"])`` would NOT evict —
    eviction there requires the event-time column inside the dedup key
    subset — so on an unbounded crawl feed its state grows O(corpus).)
    A duplicate arriving more than ``watermark`` after its first sighting
    may be re-admitted — the documented at-least-once trade-off; within
    the window dedup is exact. Same fingerprint as the batch path
    (operators/dedup.py), so a batch backfill and the stream agree on
    identity.
    """
    from amanogawa_spark.operators.dedup import normalized_text

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(path)
    norm = normalized_text(F.col("text"))
    # identical 128-bit key construction to exact_duplicates (salt FIRST —
    # see operators/dedup.py for the seed-chain collision math)
    fp = F.struct(
        F.xxhash64(F.lit(1), norm).alias("h1"),
        F.xxhash64(F.lit(2), norm).alias("h2"),
    )
    return (
        stream.withColumn("dup_key", fp)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["dup_key"])
        .select("doc_id", "ts", "text")
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


def band_signature_rows(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, ts, band, sig) — one LSH band-signature row per document
    per band (xxhash64 of the band's minhash slice).  Pure expressions,
    so it applies identically to a batch frame and a readStream frame —
    the stream/batch agreement surface for near-dup candidacy."""
    from amanogawa_spark.operators.dedup import minhash_signature, shingles

    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(F.col("text"), shingle_n), num_hashes)
    return df.select(
        "doc_id",
        "ts",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(sig, b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("sig"),
                ),
            )
        ).alias("bs"),
    ).select(
        "doc_id", "ts", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )

def streaming_neardup_bands(
    spark: SparkSession,
    path: str,
    watermark: str = "1 hour",
    window: str = "10 minutes",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Streaming NEAR-dup detection: LSH band collisions within the
    watermark horizon.  Emits (window_start, doc_id, fresh_bands,
    is_fresh) — ``is_fresh`` means every band signature was first seen
    with this document, i.e. no prior doc inside the watermark window
    shares any band (the batch ``minhash_candidates`` collision rule,
    restated as a stream).

    Formulation: explode each doc to its ``bands`` (band, signature)
    rows, ``dropDuplicatesWithinWatermark`` on [band, sig] (state =
    band signatures per watermark window — BOUNDED, same eviction
    argument as :func:`streaming_dedup_exact`), then a watermarked
    windowed count per doc: a doc that kept all ``bands`` rows collided
    with nobody.  A near-dup arriving later loses ≥1 band row and
    reports ``is_fresh = false``.  Output lands when the watermark
    closes the window (append-mode aggregation semantics).

    Same signature construction as the batch path (xxhash64 permuted
    minima over word shingles), so a batch backfill and the stream
    agree on candidacy.
    """
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes ({num_hashes}) % bands ({bands}) != 0")
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(path)
    banded = band_signature_rows(stream, num_hashes, bands, shingle_n)
    fresh_rows = (
        banded.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["band", "sig"])
    )
    counts = fresh_rows.groupBy(
        F.window("ts", window).alias("w"), "doc_id"
    ).agg(F.count("*").alias("fresh_bands"))
    return counts.select(
        F.col("w.start").alias("window_start"),
        "doc_id",
        "fresh_bands",
        (F.col("fresh_bands") == bands).alias("is_fresh"),
    )
