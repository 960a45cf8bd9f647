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
