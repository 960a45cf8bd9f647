"""Sequence packing — fixed token-budget batches for LLM pretraining.

The standard pretraining data layout concatenates shuffled documents into
one token stream and slices it every ``max_tokens`` (a document may
straddle a boundary). Assigning each document its slice therefore needs
the GLOBAL cumulative token count over a deterministic document order —
the op that is trivial single-node and a trap in Spark: a bare
``Window.orderBy(...)`` cumulative sum funnels the whole corpus through
ONE task.

Scalable formulation (same two-pass shape as
``graph/build.dense_rank_ids``): ``repartitionByRange`` over the shuffle
key gives range-ordered partitions; a tiny per-partition token-sum job
gives each range's global starting offset; a within-partition cumulative
window (parallel — keyed by partition id) plus that offset is the exact
global cumsum. Deterministic given the data: the shuffle key is a pure
per-row hash (no RNG), so reruns, repartitionings, and engines agree on
the stream order — the property that makes the packing reproducible and
the DuckDB oracle possible (``hash='md5'``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.operators.sampling import _row_hash


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    hash: str = "xxhash64",
    seed: int = 7,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id_col, tokens_col, seq_id, seq_offset): the document's position in
    the packed stream — it starts in sequence ``seq_id`` at offset
    ``seq_offset`` (and may continue into following sequences when
    ``seq_offset + n_tokens > max_tokens``, the standard boundary chop).

    Documents are streamed in (row-hash, id) order — a deterministic
    shuffle. seq_id = floor(global_cumsum_before / max_tokens).
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keyed = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        _row_hash([id_col], hash, seed).alias("_okey"),
    )
    ranged = (
        keyed.repartitionByRange(n_part, F.col("_okey"), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum(tokens_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_okey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        ranged.join(offset_df, "_pid")
        .withColumn(
            "_start",
            F.coalesce(F.sum(tokens_col).over(w), F.lit(0)) + F.col("_offset"),
        )
        .select(
            id_col,
            tokens_col,
            (F.col("_start") / max_tokens).cast("long").alias("seq_id"),
            (F.col("_start") % max_tokens).alias("seq_offset"),
        )
    )
    # materialize before releasing the range cache (same teardown contract
    # as dense_rank_ids) — the caller gets a lineage-truncated result
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    return out


def sequence_manifest(packed: DataFrame, max_tokens: int) -> DataFrame:
    """(seq_id, doc_id, tok_begin, tok_end): the slice of each packed
    sequence every document occupies — offsets are within-sequence,
    ``[tok_begin, tok_end)`` with ``0 <= tok_begin < tok_end <=
    max_tokens``. This is the trainer-facing half of packing: a packed
    batch needs its document boundaries back for block-diagonal
    attention masks and per-document loss masking, and a document that
    straddles sequence boundaries must appear once per sequence it
    touches (the standard boundary chop).

    Input: :func:`pack_sequences` output (doc_id, n_tokens-ish column
    named as packed, seq_id, seq_offset). Pure map stage: one BOUNDED
    explode (a document spans ``ceil(n/max_tokens)+1`` sequences at
    most), no shuffle, no join — at 100 TB this is scan-speed.
    Zero-token documents emit no rows.
    """
    tokens_col = [c for c in packed.columns if c not in ("doc_id", "seq_id", "seq_offset")][0]
    s = F.col("seq_id") * max_tokens + F.col("seq_offset")
    e = s + F.col(tokens_col)
    last = ((e - 1) / max_tokens).cast("long")
    rows = packed.filter(F.col(tokens_col) > 0).select(
        packed.columns[0],
        s.alias("_s"),
        e.alias("_e"),
        F.explode(F.sequence(F.col("seq_id"), last)).alias("_seq"),
    )
    return rows.select(
        F.col("_seq").alias("seq_id"),
        F.col(packed.columns[0]),
        F.greatest(F.col("_s") - F.col("_seq") * max_tokens, F.lit(0)).alias(
            "tok_begin"
        ),
        F.least(
            F.col("_e") - F.col("_seq") * max_tokens, F.lit(max_tokens)
        ).alias("tok_end"),
    )
