"""CSR-style persisted adjacency layouts (SURVEY.md §4.2 item 1).

The reference materializes every intermediate in memory
(``core/executor.h:24-28``); at 10^12 edges the equivalent decision is the
ON-DISK layout of the edge table, because iterative algorithms re-join it
every round. Two layouts:

1. **Bucketed** (:func:`write_bucketed_edges`): hash-bucketed + sorted by
   ``src_id`` via the catalog (``bucketBy().sortBy().saveAsTable``). A join
   or aggregation keyed on ``src_id`` against this table requires NO
   Exchange on the edge side — Spark trusts the bucket metadata, so each
   PageRank iteration shuffles only the (much smaller) ranks side.
   :func:`assert_no_edge_exchange` proves it from the physical plan.

2. **Range-sorted parquet** (:func:`write_range_sorted_edges`):
   ``repartitionByRange(src_id) + sortWithinPartitions(src_id, dst_id)``
   plain parquet — the portable variant for when no catalog is available
   (checkpoint dirs, external readers). Sorted runs give parquet min/max row-group
   pruning on ``src_id`` range predicates and make per-partition adjacency
   scans sequential.

Bucket count guidance at scale: target ~128-512 MB of edges per bucket
(e.g. 100 TB of edges → ~400k buckets is too many for the driver;
pick buckets ≈ total cores × small constant and let AQE handle residue).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    n_buckets: int = 32,
    sort_cols: tuple[str, str] = ("src_id", "dst_id"),
) -> None:
    """Persist edges hash-bucketed on src_id, sorted within buckets."""
    spark = edges.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh session's catalog may not know a previous run's table, in which
    # case the orphaned warehouse dir blocks CREATE — remove it explicitly
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    # db-qualified tables live under <warehouse>/<db>.db/<table>; only the
    # default database's tables sit directly under the warehouse root
    parts = [p.lower() for p in table.split(".")]
    if len(parts) >= 2 and parts[-2] != "default":
        stale = os.path.join(warehouse, f"{parts[-2]}.db", parts[-1])
    else:
        stale = os.path.join(warehouse, parts[-1])
    if os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)
    (
        edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "src_id")
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_range_sorted_edges(
    edges: DataFrame, path: str, num_partitions: int | None = None
) -> None:
    """Range-partition by src_id, sort (src_id, dst_id) within partitions,
    write plain parquet — portable CSR-ish layout with row-group pruning."""
    spark = edges.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        edges.repartitionByRange(n, F.col("src_id"))
        .sortWithinPartitions("src_id", "dst_id")
        .write.mode("overwrite")
        .parquet(path)
    )


def out_degrees_bucketlocal(edges: DataFrame) -> DataFrame:
    """groupBy(src_id) over a bucketed edge table — shuffle-free when the
    input carries bucket partitioning (the scan reports hash(src_id))."""
    return edges.groupBy(F.col("src_id").alias("id")).agg(
        F.count("*").alias("out_degree")
    )


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    plan = _physical_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)


def assert_no_edge_exchange(df: DataFrame, max_exchanges: int) -> str:
    """Raise if the plan shuffles more than ``max_exchanges`` times; returns
    the plan text for logging/inspection."""
    plan = _physical_plan(df)
    n = count_exchanges(df)
    if n > max_exchanges:
        raise AssertionError(
            f"expected <= {max_exchanges} Exchange operators, found {n}:\n{plan}"
        )
    return plan
