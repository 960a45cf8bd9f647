"""Distributed greedy graph coloring (Jones–Plassmann).

Beyond-reference scope: a proper vertex coloring partitions the graph into
independent sets — the scheduling primitive for conflict-free parallel
updates (e.g. batching in-place vertex mutations so no two adjacent pages
update in the same wave), and a building block for distributed symmetry
breaking generally.

Jones–Plassmann (1993): fix one deterministic priority per vertex; each
round, every still-uncolored vertex whose priority beats all its
*uncolored* neighbours picks the smallest color absent from its
already-colored neighbourhood. Random priorities give O(log n / log log n)
expected rounds; colors used ≤ Δ+1.

Same engine shape as :mod:`amanogawa_spark.graph.mis` (which this
generalizes — round-1 winners of JP are exactly Luby's first MIS round):

- priorities are engine-portable md5 strings (no RNG state, unique per
  vertex via the id suffix) — FIXED across rounds per JP, so the round
  kernel is SQL-mirrorable and ``q_coloring2`` value-checks two unrolled
  rounds;
- per round: one edge-sized shuffle for the uncolored-neighbour priority
  min, one for the colored-neighbour color sets (both map-side combined);
  the adjacency shrinks to the surviving uncolored subgraph every round;
- the smallest-missing-color (mex) is a pure Catalyst fold over the
  sorted distinct neighbour colors — no UDF;
- eager localCheckpoint per round truncates the self-referential lineage
  (same ~4×-plan-growth hazard the MIS docstring documents).

Caveat (measured in graph/partition.py): chains of eager localCheckpoints
degrade past ~9 rounds on this Spark build (4× slower per round). These
loops finish in O(log n) rounds — well under that — but if a pathological
input needs deeper rounds, switch truncation to the parquet round-trip
pattern spinner_partition uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.graph.components import _symmetrize


def _priority(seed: int):
    """Fixed (round-independent) sortable engine-portable priority."""
    return F.concat(
        F.md5(F.concat_ws(":", F.lit(seed).cast("string"), F.col("id").cast("string"))),
        F.lpad(F.col("id").cast("string"), 12, "0"),
    )


def _mex(sorted_colors):
    """Smallest non-negative int absent from an ASC-sorted distinct array."""
    return F.aggregate(
        sorted_colors,
        F.lit(0),
        lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
    )


def jp_round(
    active: DataFrame, adj: DataFrame, colored: DataFrame | None, seed: int = 0
) -> DataFrame:
    """One Jones–Plassmann round → (id, color) for this round's winners.

    ``active``: (id) uncolored vertices; ``adj``: symmetric simple
    adjacency (u, v) restricted to active×active; ``colored``: (id, color)
    so far (None on round 1). Winners have the strictly smallest priority
    in their active neighbourhood (isolated actives win); each takes the
    mex of its colored neighbours' colors.
    """
    pri = active.select("id", _priority(seed).alias("pri"))
    nbr_min = (
        adj.join(pri.select(F.col("id").alias("u"), F.col("pri").alias("pri_u")), "u")
        .groupBy(F.col("v").alias("id"))
        .agg(F.min("pri_u").alias("nbr_min"))
    )
    winners = (
        pri.join(nbr_min, "id", "left")
        .filter(F.col("nbr_min").isNull() | (F.col("pri") < F.col("nbr_min")))
        .select("id")
    )
    if colored is None:
        return winners.select("id", F.lit(0).alias("color"))
    # colors already taken around each winner — note: joins the FULL colored
    # frame through the original adjacency held by the caller
    taken = (
        adj.join(winners.select(F.col("id").alias("v")), "v", "semi")
        .join(
            colored.select(F.col("id").alias("u"), F.col("color").alias("c_u")), "u"
        )
        .groupBy(F.col("v").alias("id"))
        .agg(F.array_sort(F.collect_set("c_u")).alias("cs"))
    )
    return winners.join(taken, "id", "left").select(
        "id",
        F.when(F.col("cs").isNull(), F.lit(0)).otherwise(_mex(F.col("cs"))).alias("color"),
    )


def jp_coloring(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    seed: int = 0,
    max_rounds: int = 64,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Proper coloring of the undirected simple graph: (id, color, jp_round).

    Deterministic for a given seed regardless of partitioning; uses at
    most Δ+1 colors. Raises if ``max_rounds`` is exhausted with uncolored
    vertices remaining (no silent partial result — the SCC contract).
    """
    full_adj = _symmetrize(edges).localCheckpoint(eager=True)
    adj = full_adj
    active = vertices.select("id").distinct().localCheckpoint(eager=True)
    colored: DataFrame | None = None

    for r in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        # winners computed on the shrunken active adjacency; color mex on the
        # FULL adjacency (colored neighbours are by definition not active)
        pri = active.select("id", _priority(seed).alias("pri"))
        nbr_min = (
            adj.join(pri.select(F.col("id").alias("u"), F.col("pri").alias("pri_u")), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("pri_u").alias("nbr_min"))
        )
        winners = (
            pri.join(nbr_min, "id", "left")
            .filter(F.col("nbr_min").isNull() | (F.col("pri") < F.col("nbr_min")))
            .select("id")
        )
        if colored is None:
            round_colored = winners.select(
                "id", F.lit(0).alias("color"), F.lit(r).alias("jp_round")
            )
        else:
            taken = (
                full_adj.join(winners.select(F.col("id").alias("v")), "v", "semi")
                .join(
                    colored.select(F.col("id").alias("u"), F.col("color").alias("c_u")),
                    "u",
                )
                .groupBy(F.col("v").alias("id"))
                .agg(F.array_sort(F.collect_set("c_u")).alias("cs"))
            )
            round_colored = winners.join(taken, "id", "left").select(
                "id",
                F.when(F.col("cs").isNull(), F.lit(0))
                .otherwise(_mex(F.col("cs")))
                .alias("color"),
                F.lit(r).alias("jp_round"),
            )
        round_colored = round_colored.localCheckpoint(eager=True)
        colored = (
            round_colored
            if colored is None
            else colored.unionByName(round_colored)
        )
        if (r + 1) % checkpoint_every == 0:
            colored = colored.localCheckpoint(eager=True)
        active = active.join(round_colored.select("id"), "id", "anti").localCheckpoint(
            eager=True
        )
        adj = (
            adj.join(active.select(F.col("id").alias("u")), "u", "semi")
            .join(active.select(F.col("id").alias("v")), "v", "semi")
            .localCheckpoint(eager=True)
        )
    else:
        leftover = active.count()
        if leftover:
            raise RuntimeError(
                f"jp_coloring: {leftover} vertices still uncolored after "
                f"{max_rounds} rounds — raise max_rounds"
            )
    if colored is None:
        return vertices.select(
            "id", F.lit(0).alias("color"), F.lit(0).alias("jp_round")
        ).limit(0)
    return colored
