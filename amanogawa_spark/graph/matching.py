"""Maximal matching + graph contraction (multilevel coarsening primitives).

A maximal matching pairs up adjacent vertices so no two pairs share a
vertex and no unmatched edge has both endpoints free — the coarsening
step of every multilevel graph algorithm (METIS-style partitioning,
multilevel layout): contract each matched pair into a super-vertex,
solve on the half-sized graph, project back. Pairs with
:mod:`amanogawa_spark.graph.partition` (partition the coarse graph, then
refine on the fine one).

Same deterministic symmetry-breaking family as MIS/coloring, lifted from
vertices to EDGES: every edge draws an engine-portable md5 priority; an
edge joins the matching iff its priority is the strict minimum among all
edges touching either endpoint (a local minimum in the line graph —
two winners can never share a vertex). Matched vertices leave; repeat.
Expected O(log m) rounds.

Per round: ONE edge-sized shuffle computing per-vertex minimum edge
priority (map-side combined), one join back to test both endpoints, and
O(matched) set algebra. The one-round kernel is SQL-mirrorable
(``q_matching1``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.graph.components import _symmetrize


def _edge_pri():
    """Engine-portable unique edge priority: md5(u~v) + zero-padded key."""
    return F.concat(
        F.md5(
            F.concat_ws(
                "~", F.col("u").cast("string"), F.col("v").cast("string")
            )
        ),
        F.lpad(F.col("u").cast("string"), 12, "0"),
        F.lpad(F.col("v").cast("string"), 12, "0"),
    )


def matching_round_winners(cand: DataFrame) -> DataFrame:
    """One round: (u, v) edges whose priority is the strict minimum at BOTH
    endpoints. ``cand``: canonical u < v candidate edges."""
    pri = cand.select("u", "v", _edge_pri().alias("pri"))
    touch = pri.select(F.col("u").alias("id"), "pri").unionAll(
        pri.select(F.col("v").alias("id"), "pri")
    )
    vmin = touch.groupBy("id").agg(F.min("pri").alias("vmin"))
    return (
        pri.join(vmin.select(F.col("id").alias("u"), F.col("vmin").alias("mu")), "u")
        .join(vmin.select(F.col("id").alias("v"), F.col("vmin").alias("mv")), "v")
        .filter((F.col("pri") == F.col("mu")) & (F.col("pri") == F.col("mv")))
        .select("u", "v")
    )


def maximal_matching(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """(u, v) matched pairs (u < v) of the undirected simple graph.

    Raises if ``max_rounds`` is exhausted with matchable edges remaining
    (no silent partial result). Lineage truncates via eager
    localCheckpoint — round counts are O(log m), far under the chained-
    checkpoint degradation threshold documented in graph/partition.py.
    """
    cand = (
        _symmetrize(edges)
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    matched: DataFrame | None = None
    for _ in range(max_rounds):
        if cand.limit(1).count() == 0:
            break
        winners = matching_round_winners(cand).localCheckpoint(eager=True)
        matched = winners if matched is None else matched.unionAll(winners)
        used = winners.select(F.col("u").alias("id")).unionAll(
            winners.select(F.col("v").alias("id"))
        )
        cand = (
            cand.join(used.select(F.col("id").alias("u")), "u", "anti")
            .join(used.select(F.col("id").alias("v")), "v", "anti")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    else:
        leftover = cand.count()
        if leftover:
            raise RuntimeError(
                f"maximal_matching: {leftover} candidate edges remain after "
                f"{max_rounds} rounds — raise max_rounds"
            )
    if matched is None:
        return edges.sparkSession.createDataFrame([], "u long, v long")
    return matched


def contract_matching(edges: DataFrame, matching: DataFrame) -> DataFrame:
    """(src_id, dst_id, weight) — the coarse multigraph: each matched pair
    collapses into its smaller id; parallel edges sum into ``weight``
    (input weights sum through when present, so repeated contraction
    composes — level-2 weights are true fine-edge multiplicities);
    self-loops (intra-pair edges) drop. Two mapping joins + one
    map-side-combined aggregate."""
    m = matching.select(F.col("u").alias("id"), F.least("u", "v").alias("super")).unionAll(
        matching.select(F.col("v").alias("id"), F.least("u", "v").alias("super"))
    )
    src_m = m.select(F.col("id").alias("src_id"), F.col("super").alias("s_new"))
    dst_m = m.select(F.col("id").alias("dst_id"), F.col("super").alias("d_new"))
    w_in = (
        F.col("weight").cast("long") if "weight" in edges.columns else F.lit(1)
    )
    return (
        edges.withColumn("_w", w_in)
        .join(src_m, "src_id", "left")
        .join(dst_m, "dst_id", "left")
        .select(
            F.coalesce("s_new", F.col("src_id")).alias("src_id"),
            F.coalesce("d_new", F.col("dst_id")).alias("dst_id"),
            "_w",
        )
        .filter(F.col("src_id") != F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(F.sum("_w").cast("long").alias("weight"))
    )
