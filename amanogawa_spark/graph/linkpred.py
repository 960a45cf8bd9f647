"""Link prediction over the undirected page graph.

Common-neighbor family scores for non-adjacent vertex pairs — the
classic crawl-frontier / related-pages primitives (Liben-Nowell &
Kleinberg 2003): common-neighbor count, Adamic-Adar (1/ln deg weighted),
and Jaccard over neighbor sets. The reference has no link-prediction
operator; this extends the engine's graph surface the same way the
k-core/HITS additions did (SURVEY.md §2 "beyond the reference").

Scale shape: the only expensive step is the wedge self-join through the
shared neighbor w — exactly the triangle-count join, so the same skew
bound applies: a hub of degree d contributes d² candidate pairs.
``max_degree`` excludes hub *intermediates* (their 1/ln(deg) weight is
the smallest anyway, so high-degree wedges carry the least signal —
the standard approximation) and bounds the join at
Σ min(d, max_degree)² — linear in |E| for a fixed cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction_scores(
    edges: DataFrame,
    k: int = 100,
    max_degree: int | None = None,
) -> DataFrame:
    """Top-``k`` non-adjacent pairs: (id_a < id_b, cn, adamic_adar, jaccard).

    - ``cn``: number of common neighbors in the canonicalized simple
      undirected graph;
    - ``adamic_adar``: Σ_w 1/ln(deg(w)) over common neighbors w (deg(w) ≥ 2
      whenever w is a common neighbor of two distinct vertices, so the log
      never vanishes);
    - ``jaccard``: cn / (deg(a) + deg(b) − cn).

    Ranked by Adamic-Adar desc with (id_a, id_b) ascending tiebreak —
    fully deterministic.
    """
    e = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))
    mids = deg.select(F.col("u").alias("w"), F.col("deg").alias("deg_w"))
    if max_degree is not None:
        mids = mids.filter(F.col("deg_w") <= max_degree)
    # wedge u—w—v through each (kept) intermediate w
    left = adj.join(mids, "w")
    right = adj.select(F.col("w"), F.col("u").alias("v"))
    wedges = left.join(right, "w").filter(F.col("u") < F.col("v"))
    scored = (
        wedges.groupBy("u", "v")
        .agg(
            F.count("*").alias("cn"),
            F.sum(F.lit(1.0) / F.log("deg_w")).alias("adamic_adar"),
        )
        # non-adjacent pairs only: drop existing edges
        .join(
            e.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"],
            "left_anti",
        )
        .join(deg.select(F.col("u"), F.col("deg").alias("deg_u")), "u")
        .join(deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v")), "v")
        .select(
            F.col("u").alias("id_a"),
            F.col("v").alias("id_b"),
            "cn",
            "adamic_adar",
            (
                F.col("cn")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn"))
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("adamic_adar"), F.asc("id_a"), F.asc("id_b")
    ).limit(k)
