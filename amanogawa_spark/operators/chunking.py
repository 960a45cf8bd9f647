"""Document chunking for training-data pipelines.

Sliding-window chunker: each document becomes ⌈len/stride⌉ overlapping
character windows — the step between corpus curation and sequence
packing (:mod:`amanogawa_spark.operators.packing` packs the chunks).
Pure Catalyst (sequence + explode + substring): map-side only, no
shuffle, no Python — a 100 TB corpus chunks at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, chunk_text, chunk_len).

    Windows start at 0, stride, 2·stride, … while the start is inside
    the document; each window takes ``size`` chars (the final ones are
    shorter). ``stride < size`` gives ``size − stride`` chars of overlap
    so no boundary context is lost — the standard LM-pretraining
    chunking. Empty documents yield one empty chunk (chunk_idx 0), so
    every input row is represented downstream.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(n - 1, F.lit(0)).cast("long"),
        F.lit(stride).cast("long"),
    )
    exploded = docs.select(
        F.col(id_col), F.col(text_col), F.explode(starts).alias("chunk_start")
    )
    return exploded.select(
        id_col,
        (F.col("chunk_start") / stride).cast("long").alias("chunk_idx"),
        "chunk_start",
        F.substring(F.col(text_col), F.col("chunk_start").cast("int") + 1, size).alias(
            "chunk_text"
        ),
        F.length(
            F.substring(F.col(text_col), F.col("chunk_start").cast("int") + 1, size)
        ).alias("chunk_len"),
    )
