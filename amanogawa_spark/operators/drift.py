"""Distribution-drift detection between corpus snapshots: exact two-sample
Kolmogorov–Smirnov statistic and the Population Stability Index.

The monitoring layer for recrawl pipelines: quality-score, doc-length, or
degree distributions drift between crawls long before hard failures show
up, and both statistics are the standard alarms (KS for "did the
distribution move at all", PSI with fixed bins for "which region moved and
by how much" — PSI > 0.2 is the conventional retrain/investigate line).
Pairs with ``operators/snapshots.py`` (content churn) and
``operators/recrawl.py`` (change rates), which track ROW-level change;
these track the shape of numeric columns.

Scale: KS groups both snapshots by distinct value (one map-side-combined
shuffle), then runs the ranking_auc-style two-pass range-partitioned
cumulative sum — a |partitions|-row offset collect and per-partition
windows, never a single-partition global sort. PSI is two map-side
aggregates over a broadcast-free additive bin expression. Work scales
with DISTINCT values (KS) / O(bins) rows (PSI), not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row (n_a, n_b, ks_r): exact two-sample KS distance
    ``D = max_x |F_a(x) - F_b(x)|`` over the pooled observed values.

    Null values are dropped (they have no place on the ECDF). Exact for
    float and integer columns alike — ties collapse into one distinct
    value whose cumulative step covers both sides.
    """
    spark = df_a.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    v = F.col(col)
    pooled = (
        df_a.select(v.alias("v"), F.lit(1).alias("ca"), F.lit(0).alias("cb"))
        .unionAll(
            df_b.select(v.alias("v"), F.lit(0).alias("ca"), F.lit(1).alias("cb"))
        )
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    ranged = (
        pooled.repartitionByRange(n_part, F.col("v").asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    per = {
        r["_pid"]: (int(r["sa"] or 0), int(r["sb"] or 0))
        for r in ranged.groupBy("_pid")
        .agg(F.sum("ca").alias("sa"), F.sum("cb").alias("sb"))
        .collect()
    }
    offsets, acc_a, acc_b = {}, 0, 0
    for pid in sorted(per):
        offsets[pid] = (acc_a, acc_b)
        acc_a += per[pid][0]
        acc_b += per[pid][1]
    n_a, n_b = acc_a, acc_b
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(oa), int(ob)) for p, (oa, ob) in offsets.items()]
            or [(0, 0, 0)],
            "_pid int, _offa long, _offb long",
        )
    )
    win = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = ranged.join(offset_df, "_pid").select(
        F.abs(
            (F.col("_offa") + F.sum("ca").over(win)) / F.lit(float(n_a or 1))
            - (F.col("_offb") + F.sum("cb").over(win)) / F.lit(float(n_b or 1))
        ).alias("gap")
    )
    row = gap.agg(F.max("gap").alias("d")).collect()[0]
    ranged.unpersist()
    ks = float(row["d"]) if n_a and n_b and row["d"] is not None else float("nan")
    return spark.createDataFrame(
        [(n_a, n_b, round(ks, 8))], "n_a long, n_b long, ks_r double"
    )


def _bin_of(col, breaks: list[float]):
    """Additive bin index: count of breaks <= x (0 = underflow bin)."""
    b = F.lit(0)
    for t in breaks:
        b = b + F.when(col >= F.lit(float(t)), 1).otherwise(0)
    return b


def psi_bins(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    breaks: list[float],
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-bin PSI decomposition: (bin, n_a, n_b, psi_term_r) over the
    fixed ``breaks`` (bin 0 is the underflow bin, bin len(breaks) the
    overflow). ``sum(psi_term_r)`` is the headline PSI; per-bin terms say
    WHERE the distribution moved. Laplace ``smoothing`` keeps empty bins
    finite: p = (cnt + s) / (n + s·n_bins).

    Breaks come from the caller — conventionally the baseline snapshot's
    quantiles (:func:`amanogawa_spark.operators.stats.exact_quantiles`),
    frozen so successive crawls compare against the same grid.
    """
    n_bins = len(breaks) + 1
    v = F.col(col)

    def side(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.filter(v.isNotNull())
            .select(_bin_of(v, breaks).alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(f"n_{tag}"))
        )
    spark = df_a.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    j = (
        grid.join(side(df_a, "a"), "bin", "left")
        .join(side(df_b, "b"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = j.agg(F.sum("n_a"), F.sum("n_b")).collect()[0]
    ta, tb = float(tot[0] or 0), float(tot[1] or 0)
    s = float(smoothing)
    pa = (F.col("n_a") + F.lit(s)) / F.lit(ta + s * n_bins)
    pb = (F.col("n_b") + F.lit(s)) / F.lit(tb + s * n_bins)
    return j.select(
        "bin",
        "n_a",
        "n_b",
        F.round((pa - pb) * F.log(pa / pb), 8).alias("psi_term_r"),
    )
