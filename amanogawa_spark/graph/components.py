"""Connected components over an edge DataFrame.

Two implementations (SURVEY.md §7 step 5):

1. ``connected_components`` — **small-star / large-star** (Kiveris et al.,
   "Connected Components in MapReduce and Beyond", SoCC'14). Converges in
   O(log^2 n) rounds on real graphs; each round is two join+agg passes.
   This is the 100 TB path: no dependence on graph diameter.

2. ``connected_components_minlabel`` — synchronous min-label propagation
   (label = min over self ∪ neighbors). O(diameter) rounds; simple,
   oracle-friendly; used for cross-checking and fixed-iteration oracles.

Both return ``(id long, component long)`` where ``component`` is the
minimum vertex id of the component (deterministic canonical label).
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Directed (src_id, dst_id) → undirected neighbor pairs (u, v), u != v."""
    fwd = edges.select(F.col("src_id").alias("u"), F.col("dst_id").alias("v"))
    rev = edges.select(F.col("dst_id").alias("u"), F.col("src_id").alias("v"))
    return fwd.union(rev).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = 50,
    checkpoint_every: int = 1,
    checkpoint=None,
    initial: DataFrame | None = None,
) -> DataFrame:
    """Small-star/large-star alternation until the edge set stops changing.

    ``initial``: optional previous assignment ``(id, component)`` — the
    incremental-recrawl warm start. Each prior (id → component) pair is
    injected as an extra parent-pointer edge, so vertices already known
    to be connected contract to their old component minimum in round one
    and only NEW cross-component edges need the full star cascade. The
    fixpoint is unchanged PROVIDED edges were only ADDED since the prior
    run (the append-only crawl model): injected pairs then connect only
    vertices still connected in the new graph. After edge DELETIONS a
    component can split and the warm start would glue it back — rerun
    cold in that case.

    State is the parent-pointer edge set ``(u, v)`` with v a candidate
    parent. Large-star: connect all strictly-larger neighbors of u to
    min(N(u) ∪ {u}). Small-star: connect all smaller-or-equal neighbors
    to the minimum. Fixed point: every u points at its component minimum.

    ``checkpoint``: optional
    :class:`~amanogawa_spark.checkpoint.CheckpointManager` — each round's
    parent-pointer set is snapshotted durably (with per-partition manifest
    + metrics journal) and a killed job resumes from the latest round,
    the same superjob contract as pagerank (north rule: every iteration
    resumable). The durable re-read doubles as the lineage truncation.
    """
    spark = vertices.sparkSession
    base = _symmetrize(edges)
    if initial is not None:
        warm = (
            initial.select(F.col("id").alias("u"), F.col("component").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        base = base.union(warm).union(
            warm.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    pairs = base.persist(StorageLevel.MEMORY_AND_DISK)

    def large_star(e: DataFrame) -> DataFrame:
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        m = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        return (
            nbrs.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient every pair so u >= v, group by u, link all v's (and u) to min
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        linked = (
            oriented.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return linked

    def _sig(df: DataFrame):
        """(count, xor-of-row-hashes) set signature — one cheap action per
        round instead of two exceptAll scans; 2^-64 false-stop risk."""
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),  # xor: no ANSI overflow
        ).collect()[0]
        return (row["n"], row["h"])

    e = pairs
    start_round = 0
    if checkpoint is not None:
        last = checkpoint.latest_iteration()
        if last is not None:
            e = checkpoint.load(last)
            start_round = last
    prev_sig = _sig(e)
    prev_cached = None  # the persisted handle (NOT the checkpoint wrapper —
    # unpersisting the wrapper is a no-op on the cache-manager entry)
    for rnd in range(start_round + 1, max_rounds + 1):
        t0 = _time.time()
        cached = small_star(large_star(e)).persist(StorageLevel.MEMORY_AND_DISK)
        # each round references the previous edge set ~16x (nbrs/oriented
        # reuse), so the LOGICAL plan grows 16^rounds and Catalyst
        # re-analysis goes exponential — truncate every round by default
        if checkpoint is not None and rnd % checkpoint_every == 0:
            new_e = checkpoint.save(cached, rnd)  # durable + fresh lineage
        elif rnd % checkpoint_every == 0:
            new_e = cached.localCheckpoint(eager=True)
        else:
            new_e = cached
        sig = _sig(new_e)
        if checkpoint is not None:
            checkpoint.log_metrics(
                rnd, n_pairs=sig[0], sig=sig[1], seconds=_time.time() - t0
            )
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = cached
        e = new_e
        if sig == prev_sig:
            break
        prev_sig = sig
    comp = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    # materialize the O(V) result so every per-round cache (including the
    # final round's, which `e` may still BE when the signature-converged
    # break fires between checkpoints) can be released before returning —
    # same teardown shape as pagerank
    result = (
        vertices.select("id")
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
        .localCheckpoint(eager=True)
    )
    if prev_cached is not None:
        prev_cached.unpersist()
    pairs.unpersist()
    return result


def connected_components_minlabel(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = 200,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Synchronous min-label propagation. ``fixed_rounds`` runs exactly that
    many rounds without a convergence test (the SQL-oracle variant)."""
    pairs = _symmetrize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    labels = vertices.select("id", F.col("id").alias("component")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    # persisted handles pending release — freed at each eager checkpoint
    # (whose blocks supersede them); unpersisting the checkpoint WRAPPER
    # (the old code) is a no-op on the cache-manager entry and leaked one
    # cached label set per checkpointed round
    pending = [labels]
    for rnd in range(1, rounds + 1):
        nbr_min = (
            pairs.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        cached = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        prev_labels = labels
        if rnd % checkpoint_every == 0:
            labels = cached.localCheckpoint(eager=True)
            for p in pending + [cached]:
                p.unpersist()
            pending = []
        else:
            pending.append(cached)
            labels = cached
        if fixed_rounds is None:
            changed = (
                labels.join(
                    prev_labels.withColumnRenamed("component", "old_component"), "id"
                )
                .filter(F.col("component") != F.col("old_component"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
    for p in pending:
        if p is not labels:
            p.unpersist()
    pairs.unpersist()
    return labels
