"""Exact distributed column statistics: order-statistic quantiles, histograms.

Spark ships ``percentile_approx`` (a sketch whose result depends on
accuracy parameters and merge order — unverifiable against another
engine); data-profiling for a curation pipeline wants EXACT quantiles
(token-length caps, outlier fences) that two engines can agree on
bit-for-bit. The scalable formulation reuses the two-pass
range-partitioned ranker (``graph/build.py dense_rank_ids``): no
single-partition global window, rank = range-partition offset +
within-range row_number — the k-th order statistic's VALUE is unique
even when ties make row ranks ambiguous.

Cross-engine exactness contract: pass dyadic quantiles (0.25, 0.5, …)
so ``floor(q·(n−1))`` is computed on an exact product in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.graph.build import dense_rank_ids


def exact_quantiles(
    df: DataFrame, col: str, qs: list[float], num_partitions: int | None = None
) -> DataFrame:
    """(q, value): exact lower order statistics — value at rank
    ``floor(q·(n−1))`` of the sorted column (numpy 'lower' interpolation).

    One range-partitioned rank pass + one O(1) count + a broadcast join
    of the |qs|-row rank table. NULLs are excluded before ranking. The
    |qs| result rows are collected eagerly and the corpus-sized ranked
    frame is unpersisted before returning, so the only thing that
    outlives the call is the tiny local result — not a pinned
    full-column cache.
    """
    vals = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    ranked = dense_rank_ids(vals, "x", num_partitions=num_partitions, out_col="rk")
    n = ranked.count()
    if n == 0:
        ranked.unpersist()
        return df.sparkSession.createDataFrame([], "q double, value double")
    targets = [(float(q), int(math.floor(q * (n - 1)))) for q in qs]
    tdf = df.sparkSession.createDataFrame(targets, "q double, rk long")
    rows = (
        F.broadcast(tdf)
        .join(ranked, "rk")
        .select("q", F.col("x").alias("value"))
        .collect()
    )
    ranked.unpersist()
    return df.sparkSession.createDataFrame(
        sorted((float(r["q"]), float(r["value"])) for r in rows),
        "q double, value double",
    )


def powerlaw_alpha(df: DataFrame, col: str, xmin: float = 1.0) -> DataFrame:
    """(xmin, n_tail, alpha): Hill/Clauset MLE of a power-law tail
    exponent — α = 1 + n / Σ ln(xᵢ/xmin) over xᵢ ≥ xmin.

    The standard web-graph profiling statistic: degree distributions of
    crawl graphs are power-law-ish with α ≈ 2.1 (in-degree), and the
    fitted exponent drives capacity planning (how bad is the hub skew →
    what salt factor / how many stripes a hub vertex needs). One
    map-side-combined aggregate over the column — profiling a 10^12-row
    degree table costs one shuffle of ONE row per partition. Continuous
    MLE (Clauset-Shalizi-Newman 2009 eq. 3.1); for integer degrees it is
    the standard upper-bound approximation, exact enough for skew
    triage.
    """
    x = F.col(col).cast("double")
    tail = df.filter(x.isNotNull() & (x >= F.lit(float(xmin))))
    agg = tail.agg(
        F.count("*").alias("n_tail"),
        F.sum(F.log(x / F.lit(float(xmin)))).alias("_logsum"),
    )
    return agg.select(
        F.lit(float(xmin)).alias("xmin"),
        "n_tail",
        (F.lit(1.0) + F.col("n_tail") / F.col("_logsum")).alias("alpha"),
    )


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """(bin, lo_edge, hi_edge, cnt): fixed-width histogram over [lo, hi).

    Values outside the range clamp into the edge bins (profiling
    convention: the tails are visible, not dropped). One map-side-combined
    aggregate — a full profile of a 100 TB column costs one shuffle of
    ``bins`` rows. Use power-of-two widths for bit-exact cross-engine
    bin assignment.
    """
    width = (hi - lo) / bins
    x = F.col(col).cast("double")
    bin_raw = F.floor((x - F.lit(lo)) / F.lit(width)).cast("long")
    bin_c = F.greatest(F.lit(0), F.least(F.lit(bins - 1), bin_raw))
    return (
        df.filter(x.isNotNull())
        .select(bin_c.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi_edge"),
            "cnt",
        )
    )


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    qs: list[float],
) -> DataFrame:
    """(group, q, value) — exact per-group lower order statistics: value
    at rank ``floor(q·(n_g−1))`` of each group's sorted column.

    The per-HOST profiling companion to :func:`exact_quantiles` (which is
    global and two-pass): here each group's rows are bounded (documents
    per host ≪ corpus), so ONE window keyed on the group ranks in
    parallel across groups, a per-group count joins in, and the |qs|
    target ranks select the answers.  NULLs excluded per group.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    vals = df.select(
        F.col(group_col).alias("group"), F.col(col).cast("double").alias("x")
    ).filter(F.col("x").isNotNull())
    w = Window.partitionBy("group").orderBy(F.asc("x"))
    ranked = vals.withColumn("rk", (F.row_number().over(w) - 1).cast("long"))
    counts = vals.groupBy("group").agg(F.count("*").alias("_n"))
    targets = counts.select(
        "group",
        F.explode(F.array(*[F.lit(float(q)) for q in sorted(qs)])).alias("q"),
        "_n",
    ).select(
        "group",
        "q",
        F.floor(F.col("q") * (F.col("_n") - 1)).cast("long").alias("rk"),
    )
    return targets.join(ranked, ["group", "rk"]).select(
        "group", "q", F.col("x").alias("value")
    )


def ranking_auc(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    num_partitions: int | None = None,
) -> DataFrame:
    """One-row (n_pos, n_neg, auc) — Mann–Whitney ROC-AUC of a binary-
    labeled scored set, EXACT tie handling (ties contribute ½): the
    evaluation scalar for every ranker in the engine — link prediction,
    quality classifiers, near-dup scorers vs labels.

    AUC = [#(pos > neg) + ½·#(pos == neg)] / (n_pos·n_neg), computed
    without any pairwise join: group rows by distinct score (map-side
    combined), then a two-pass range-partitioned cumulative negative
    count in score order (the ``dense_rank_ids``/``pack_sequences``
    shape — a |partitions|-row offset collect + a per-partition window,
    never a single-partition global sort). Exact for integer and float
    scores alike; work scales with DISTINCT scores after the first
    aggregate.
    """
    from pyspark.sql import Window

    spark = scored.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    lab = F.col(label_col).cast("long")
    g = scored.groupBy(score_col).agg(
        F.sum(lab).alias("p"),
        F.sum(F.lit(1) - lab).alias("n"),
    )
    ranged = (
        g.repartitionByRange(n_part, F.col(score_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    per = {
        r["_pid"]: int(r["s"] or 0)
        for r in ranged.groupBy("_pid").agg(F.sum("n").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(per):
        offsets[pid] = acc
        acc += per[pid]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
            "_pid int, _off long",
        )
    )
    win = (
        Window.partitionBy("_pid")
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = ranged.join(offset_df, "_pid").select(
        "p",
        "n",
        (F.col("_off") + F.coalesce(F.sum("n").over(win), F.lit(0))).alias("cumneg"),
    )
    row = cum.agg(
        F.sum("p").alias("np"),
        F.sum("n").alias("nn"),
        F.sum(F.col("p") * F.col("cumneg")).alias("wins"),
        F.sum(F.col("p") * F.col("n")).alias("ties"),
    ).collect()[0]
    ranged.unpersist()
    n_pos, n_neg = int(row["np"] or 0), int(row["nn"] or 0)
    auc = (
        (float(row["wins"]) + 0.5 * float(row["ties"])) / (n_pos * n_neg)
        if n_pos and n_neg
        else float("nan")
    )
    return spark.createDataFrame(
        [(n_pos, n_neg, auc)], "n_pos long, n_neg long, auc double"
    )
