"""k-core extraction by iterative peeling.

The k-core is the maximal subgraph in which every vertex has (undirected)
degree >= k — the standard dense-substructure primitive for link graphs
(spam-farm detection, community seeding). Peeling repeatedly removes
vertices with degree < k; each round is one join + one hash aggregate, so
the shape is identical to the engine's other iterative programs: persisted
symmetrized edges, per-round lineage truncation, count-based convergence.

Rounds needed = longest removal cascade; on web graphs this is small
(degeneracy ordering removes most vertices in the first rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.graph.components import _symmetrize


def k_core(
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """(id long) — vertices of the k-core. ``fixed_rounds`` runs exactly
    that many peeling rounds without a convergence check (the SQL-oracle
    variant); otherwise peel until no vertex is removed."""
    pairs = _symmetrize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    alive = vertices.select("id").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    n_alive = alive.count()
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    pending = [alive]
    for rnd in range(1, rounds + 1):
        deg = (
            pairs.join(alive.withColumnRenamed("id", "u"), "u")
            .join(alive.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.count("*").alias("deg"))
        )
        cached = (
            deg.filter(F.col("deg") >= k).select("id").persist(StorageLevel.MEMORY_AND_DISK)
        )
        if rnd % 3 == 0:
            new_alive = cached.localCheckpoint(eager=True)
            for p in pending + [cached]:
                p.unpersist()
            pending = []
        else:
            pending.append(cached)
            new_alive = cached
        if fixed_rounds is None:
            n_new = new_alive.count()
            alive = new_alive
            if n_new == n_alive:
                break
            n_alive = n_new
        else:
            alive = new_alive
    for p in pending:
        if p is not alive:
            p.unpersist()
    pairs.unpersist()
    return alive


def coreness_histogram(
    vertices: DataFrame, edges: DataFrame, ks: list[int] | None = None
) -> DataFrame:
    """(k int, core_size long) for a ladder of k values — the practical
    summary (full per-vertex coreness would peel once per distinct degree)."""
    ks = ks or [2, 3, 5, 10]
    spark = vertices.sparkSession
    rows = []
    for k in ks:
        rows.append((k, k_core(vertices, edges, k).count()))
    return spark.createDataFrame(rows, "k int, core_size long")
