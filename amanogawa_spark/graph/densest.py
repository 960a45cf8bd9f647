"""Densest-subgraph extraction by batched greedy peeling.

Charikar's greedy 2-approximation removes ONE minimum-degree vertex per
round — O(V) sequential rounds, a non-starter distributed. Bahmani,
Kumar & Vassilvitskii ("Densest Subgraph in Streaming and MapReduce",
PVLDB 2012) batch it: each round removes EVERY vertex whose degree is at
most 2(1+ε)·density, which still yields a 2(1+ε)-approximation but
finishes in O(log_{1+ε} V) rounds — the MapReduce/Spark-native shape.
On web graphs the densest subgraph is the canonical link-farm / mutual-
admiration-society detector: spam clusters exchange links far more
densely than organic neighborhoods, and the peel survives exactly them.

Per round: one (alive ⋈ pairs ⋈ alive) degree aggregate + two O(1)
scalar actions (|V_r|, |E_r| — the same driver-scalar convergence
pattern as ``k_core``). Since |V_r| shrinks by ≥(1+ε)× per round, the
persisted alive snapshots total ≤ V·(1+ε)/ε rows, so keeping every
round's handle until the argmax is chosen is O(V) storage, not
O(V·rounds).

No reference counterpart (its graph suite stops at construction,
``plugin/flow/to_graph/measure.h``); engine addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.graph.components import _symmetrize


def peel_profile(
    edges: DataFrame,
    eps: float = 0.5,
    max_rounds: int = 60,
    fixed_rounds: int | None = None,
) -> tuple[list[dict], list[DataFrame]]:
    """Run the peel; return (per-round stats, per-round alive frames).

    stats[r] = {"round": r, "n_vertices", "n_edges", "density"} for the
    graph at the START of round r; frames[r] is the matching persisted
    alive-vertex frame (caller unpersists). The peel stops when the
    graph empties, a round removes nothing (ε=0 degenerate input), or
    after ``fixed_rounds``/``max_rounds`` rounds — ``fixed_rounds`` is
    the SQL-oracle variant (exactly that many rounds, no early stop
    except emptiness).
    """
    if eps < 0:
        raise ValueError(f"eps must be >= 0, got {eps}")
    pairs = _symmetrize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    alive = pairs.select(F.col("u").alias("id")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    factor = 2.0 * (1.0 + eps)
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    stats: list[dict] = []
    frames: list[DataFrame] = []
    for rnd in range(rounds):
        deg = (
            pairs.join(alive.withColumnRenamed("id", "u"), "u")
            .join(alive.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.count("*").alias("deg"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_v = alive.count()
        if n_v == 0:
            deg.unpersist()
            break
        n_e = (deg.agg(F.sum("deg")).collect()[0][0] or 0) // 2
        density = n_e / n_v
        stats.append(
            {"round": rnd, "n_vertices": n_v, "n_edges": n_e, "density": density}
        )
        frames.append(alive)
        # keep iff deg > 2(1+eps)*density — same literal-first arithmetic
        # ((factor*n_e)/n_v) as the SQL mirror so borderline doubles agree
        thresh = (factor * n_e) / n_v
        nxt = deg.filter(F.col("deg") > thresh).select("id").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        deg.unpersist()
        if rnd % 4 == 3:
            chk = nxt.localCheckpoint(eager=True)
            nxt.unpersist()
            nxt = chk
        alive = nxt
        if fixed_rounds is None and n_e == 0:
            alive.unpersist()
            break
    else:
        # loop exhausted without emptying — drop the final alive handle,
        # it belongs to no recorded round
        alive.unpersist()
    pairs.unpersist()
    return stats, frames


def densest_subgraph(
    edges: DataFrame,
    eps: float = 0.5,
    max_rounds: int = 60,
    fixed_rounds: int | None = None,
) -> tuple[DataFrame, dict]:
    """((id long), stats) — the vertex set of the densest peel snapshot.

    The returned frame is the alive set at the start of the round whose
    density |E_r|/|V_r| is maximal (earliest round on exact ties — both
    engines compute the same integer-ratio doubles, so ties are
    deterministic); stats carries that round's numbers plus rounds_run.
    Guaranteed ≥ density(optimum)/(2(1+ε)) for ε > 0.
    """
    stats, frames = peel_profile(edges, eps, max_rounds, fixed_rounds)
    if not stats:
        empty = edges.sparkSession.createDataFrame([], "id long")
        return empty, {"density": 0.0, "round": 0, "rounds_run": 0}
    best = max(range(len(stats)), key=lambda r: (stats[r]["density"], -r))
    for r, f in enumerate(frames):
        if r != best:
            f.unpersist()
    return frames[best], {**stats[best], "rounds_run": len(stats)}


def peel_profile_df(
    edges: DataFrame,
    eps: float = 0.5,
    fixed_rounds: int = 6,
    round_to: int = 8,
) -> DataFrame:
    """(round, n_vertices, n_edges, density_r) — the peel trajectory as a
    DataFrame (the oracle-facing surface for :func:`peel_profile`)."""
    stats, frames = peel_profile(edges, eps, fixed_rounds=fixed_rounds)
    for f in frames:
        f.unpersist()
    spark = edges.sparkSession
    raw = spark.createDataFrame(
        [
            (s["round"], s["n_vertices"], s["n_edges"], s["density"])
            for s in stats
        ],
        "round int, n_vertices long, n_edges long, density_r double",
    )
    # F.round (half-away-from-zero, matching the SQL oracle's ROUND), not
    # Python round (banker's) — they differ on exact 5e-9 boundaries
    return raw.withColumn("density_r", F.round("density_r", round_to))
