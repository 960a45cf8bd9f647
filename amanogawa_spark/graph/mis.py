"""Maximal independent set via Luby's algorithm (deterministic priorities).

Beyond-reference scope (the reference stops at kNN graph construction,
``to_graph/to_graph.cpp:88-117``): a link-graph curation pipeline uses an
MIS as a spread-out landmark/seed set — e.g. pick crawl seeds or sketch
landmarks such that no two chosen pages link to each other.

Luby (1986): every active vertex draws a priority; a vertex enters the
MIS iff its priority beats every *active* neighbour's; winners and their
neighbours leave the active set; repeat. Expected O(log n) rounds.

Spark-first design, same shape as the other fixpoints in this package
(pagerank/components/lpa):

- priorities are **engine-portable and deterministic**: the sortable
  string ``md5(seed:round:id) || lpad(id)`` — no RNG state, identical in
  any engine with md5, and unique per vertex (the id suffix breaks the
  astronomically-unlikely digest tie), so one round is SQL-expressible
  and carries a DuckDB value oracle (``q_mis1``).
- per round: ONE edge-sized shuffle (adjacency ⋈ priorities, min-combined
  map-side) plus O(active) set algebra. The adjacency is re-restricted to
  the shrinking active set and persisted each round, so late rounds touch
  only the surviving subgraph — total work is O(E log n) worst case but
  geometrically decreasing in practice.
- lineage is truncated with an eager ``localCheckpoint`` on every
  per-round frame (each re-enters the next round's plan on both sides of
  several joins, so the plan would otherwise grow ~4× per round); the
  accumulated member list is additionally collapsed every
  ``checkpoint_every`` rounds.
- the only driver-side action per round is the O(1) active-count scalar.

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


def _priority(seed: int, round_no: int):
    """Sortable, engine-portable, per-vertex-unique priority string."""
    return F.concat(
        F.md5(
            F.concat_ws(
                ":",
                F.lit(seed).cast("string"),
                F.lit(round_no).cast("string"),
                F.col("id").cast("string"),
            )
        ),
        F.lpad(F.col("id").cast("string"), 12, "0"),
    )


def mis_round_winners(active: DataFrame, adj: DataFrame, seed: int, round_no: int) -> DataFrame:
    """One Luby round: the subset of ``active`` whose priority is strictly
    below every active neighbour's (isolated actives always win).

    ``adj`` must be the symmetric simple adjacency (u, v) already
    restricted to active×active. Returns (id, pri).
    """
    pri = active.select("id", _priority(seed, round_no).alias("pri"))
    nbr_min = (
        adj.join(pri.select(F.col("id").alias("u"), F.col("pri").alias("pri_u")), "u")
        .groupBy(F.col("v").alias("id"))
        .agg(F.min("pri_u").alias("nbr_min"))
    )
    return (
        pri.join(nbr_min, "id", "left")
        .filter(F.col("nbr_min").isNull() | (F.col("pri") < F.col("nbr_min")))
        .select("id", "pri")
    )


def luby_mis(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    seed: int = 0,
    max_rounds: int = 64,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Maximal independent set of the undirected simple graph.

    Returns (id, in_mis, mis_round) — ``mis_round`` is the Luby round the
    vertex was selected in (NULL for non-members). Deterministic for a
    given ``seed`` regardless of partitioning.

    Raises if ``max_rounds`` is exhausted with actives remaining (the
    expected round count is O(log n); 64 covers any real graph) — no
    silent partial result, per the SCC contract fixed in round 2.
    """
    # Eager localCheckpoint per round: every frame below re-enters the next
    # round's plan on BOTH sides of several joins, so without truncation the
    # logical plan grows ~4× per round (observed: a 2 GiB plan string by
    # round ~10). Checkpointing materializes exactly the frames the round
    # already has to materialize, so the extra cost is nil.
    adj = _symmetrize(edges).localCheckpoint(eager=True)
    active = vertices.select("id").distinct().localCheckpoint(eager=True)
    chosen: DataFrame | None = None

    for r in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        winners = (
            mis_round_winners(active, adj, seed, r)
            .select("id", F.lit(r).alias("mis_round"))
            .localCheckpoint(eager=True)
        )
        chosen = winners if chosen is None else chosen.unionAll(winners)
        if (r + 1) % checkpoint_every == 0:
            chosen = chosen.localCheckpoint(eager=True)
        # remove winners and their neighbours from the active set
        removed = winners.select("id").unionAll(
            adj.join(winners.select(F.col("id").alias("u")), "u", "semi")
            .select(F.col("v").alias("id"))
        ).distinct()
        active = active.join(removed, "id", "anti").localCheckpoint(eager=True)
        # shrink the adjacency to the surviving actives
        adj = (
            adj.join(active.select(F.col("id").alias("u")), "u", "semi")
            .join(active.select(F.col("id").alias("v")), "v", "semi")
            .localCheckpoint(eager=True)
        )
    else:
        leftover = active.count()
        if leftover:
            raise RuntimeError(
                f"luby_mis: {leftover} vertices still active after "
                f"{max_rounds} rounds — raise max_rounds"
            )

    base = vertices.select("id").distinct()
    if chosen is None:  # empty vertex set
        return base.select(
            "id",
            F.lit(False).alias("in_mis"),
            F.lit(None).cast("int").alias("mis_round"),
        )
    return base.join(chosen, "id", "left").select(
        "id",
        F.col("mis_round").isNotNull().alias("in_mis"),
        "mis_round",
    )
