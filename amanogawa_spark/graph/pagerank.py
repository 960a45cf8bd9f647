"""PageRank as an iterative DataFrame program.

Semantics (north rule): damping 0.85, dangling-mass redistribution,
L1-delta convergence (default 1e-6), per-vertex scores.

Scale design (SURVEY.md §4.2):
- edges are joined with out-degrees ONCE, hash-repartitioned on ``src_id``
  and persisted — per-iteration the ONLY shuffles are (a) the ranks side
  of the contribution join and (b) the ``groupBy(dst_id)`` partial+final
  hash aggregate. The persisted edge partitioning is reused every round.
- ONE driver action per iteration: the L1 delta and the NEXT iteration's
  dangling mass (``sum(rank * is_dangling)``) come out of a single
  aggregate over the materialized new-ranks DataFrame. (Two separate
  collects per iteration doubles the job count — measured 2x wall cost
  on overhead-bound graphs.)
- lineage is cut every few iterations via ``localCheckpoint`` or a durable
  :class:`CheckpointManager` snapshot (resumable path); per-iteration
  metrics (delta, dangling mass, wall time) go to the metrics journal.
- hub-vertex skew in ``groupBy(dst_id)`` is handled by AQE skew handling
  plus the optional two-level salted aggregate in ``graph/skew.py``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.checkpoint import CheckpointManager
from amanogawa_spark.graph.iter_conf import iteration_conf


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id long, rank double)
    iterations: int
    delta: float
    history: list[dict] = field(default_factory=list)


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_every: int = 5,
    checkpoint: CheckpointManager | None = None,
    num_partitions: int | None = None,
    check_every: int = 1,
    weight_col: str | None = None,
    adaptive: bool = False,
    initial_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Power iteration: r' = (1-d)/N + d * (A^T r/outdeg + dangling/N).

    ``weight_col``: optional positive edge-weight column — each source
    splits its rank proportionally to weight instead of uniformly
    (contrib = rank * w / sum-of-outgoing-w). The reference's ``to_graph``
    emits similarity-weighted kNN edges (to_graph.cpp:82-117), and
    domain-rollup graphs carry multi-edge counts; both rank correctly only
    under the weighted walk. Execution shape is IDENTICAL to the unweighted
    path — ``out_degree`` simply becomes the out-weight sum, computed once
    into the persisted edge table, so per-iteration cost does not change.

    ``check_every`` chunks k update steps into ONE driver action: the
    dangling mass is folded in-plan (1-row aggregate + broadcast cross
    join) instead of collected per iteration, so the only global barrier
    is the convergence check every k steps. At 10^12 scale fewer barriers
    = fewer straggler waits; in the sandbox it halves per-iteration driver
    latency. Convergence may overshoot by at most k-1 iterations (the L1
    delta is measured across the chunk — a conservative stop test). Keep
    k small (<= 4): each step references the rank plan ~3x, so the
    un-truncated logical plan grows ~3^k per chunk. Default 1 (the scalar
    fast path) measured fastest in BOTH sandbox regimes — the chunk's
    in-plan dangling aggregate costs an extra rank-vector pass per step and
    the cross-chunk L1 overshoots convergence; keep k=1 unless driver
    round-trip latency itself dominates (e.g. a remote driver with
    100ms+ RTT per action).
    """
    spark = vertices.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # lineage MUST be truncated aggressively: ranks is referenced ~3x per
    # step, so the un-truncated logical plan (and Catalyst re-analysis time)
    # grows ~3^k within a chunk — measured 0.5s → 80s within a 5-iteration
    # window. Every chunk ends with a lazy localCheckpoint (or durable save).

    out_deg = edges.groupBy(F.col("src_id").alias("id")).agg(
        (
            F.sum(F.col(weight_col).cast("double"))
            if weight_col is not None
            else F.count("*").cast("double")
        ).alias("out_degree")
    )
    # vertex table with a dangling indicator, partitioned on id for the
    # per-iteration joins; built once
    verts = (
        vertices.select("id")
        .distinct()
        .join(out_deg, "id", "left")
        .select("id", F.col("out_degree").isNull().cast("double").alias("dang"))
        .repartition(n_part, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = verts.count()
    if n == 0:
        return PageRankResult(
            ranks=verts.select("id", F.lit(0.0).alias("rank")), iterations=0, delta=0.0
        )

    # one-time: edge list annotated with src out-degree, partitioned on src
    # so each iteration's contribution join only shuffles the (small) ranks side
    edges_w = (
        edges.join(out_deg.withColumnRenamed("id", "src_id"), "src_id")
        .repartition(n_part, "src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = edges_w.count()
    if num_partitions is None:
        # size-aware partitioning: the iteration re-touches the SAME cached
        # partitioning ~41 times, and AQE cannot coalesce cached partitions —
        # a 33k-edge graph spread over 32 partitions pays 32 task launches
        # per stage for microseconds of work each. Target >=250k edges per
        # partition; big graphs keep the full session width (zero cost —
        # this branch only runs for small graphs, where the one-time
        # re-repartition of the tiny cached frames is <1s).
        ideal = max(2, min(n_part, n_edges // 250_000 + 1))
        if ideal < n_part:
            old_v, old_e = verts, edges_w
            verts = verts.repartition(ideal, "id").persist(StorageLevel.MEMORY_AND_DISK)
            verts.count()
            edges_w = edges_w.repartition(ideal, "src_id").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            edges_w.count()
            old_v.unpersist()
            old_e.unpersist()
            n_part = ideal

    start_iter = 0
    ranks = None
    warm = None
    if checkpoint is not None:
        last = checkpoint.latest_iteration()
        if last is not None:
            ranks = checkpoint.load(last)
            start_iter = last
    if ranks is None and initial_ranks is not None:
        # warm start (incremental recrawl): project yesterday's scores onto
        # today's vertex set — new pages get the uniform share, dropped
        # pages vanish — then renormalize to unit mass so the dangling
        # redistribution algebra stays exact. Convergence from a nearby
        # vector takes a fraction of the cold-start iterations while the
        # fixpoint itself is unchanged (power iteration has a unique
        # attractor), so this trades nothing for the speedup.
        warm = verts.join(
            initial_ranks.select("id", F.col("rank").alias("_r0")), "id", "left"
        ).select("id", F.coalesce("_r0", F.lit(1.0 / n)).alias("rank"))
        warm = warm.persist(StorageLevel.MEMORY_AND_DISK)
        mass = warm.agg(F.sum("rank")).collect()[0][0] or 1.0
        ranks = warm.select("id", (F.col("rank") / F.lit(mass)).alias("rank"))
    if ranks is None:
        ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    if warm is not None:
        # materialize the ranks cache, then release the warm frame — it only
        # feeds this one projection and would otherwise stay cached for the
        # session lifetime
        ranks.count()
        warm.unpersist()

    base = (1.0 - damping) / n
    history: list[dict] = []
    delta = float("inf")
    it = start_iter
    prev_joined = None  # last chunk's persisted frame (unpersist after successor materializes)

    # scalar fast path (check_every == 1): the dangling mass rides along in
    # the per-iteration stats action as a driver scalar — zero extra passes
    # over the rank vector. The chunked path (> 1) can't, because steps 2..k
    # run without any driver action, so it folds the mass in-plan (1-row
    # aggregate + broadcast cross join) at the cost of one extra rank-vector
    # pass per step: fewer barriers, more compute. Measured: scalar wins
    # when compute-bound (big graphs), chunked wins when overhead-bound.
    scalar_dangling: float | None = None
    if check_every <= 1:
        scalar_dangling = (
            ranks.join(verts.select("id", "dang"), "id")
            .agg(F.sum(F.col("rank") * F.col("dang")))
            .collect()[0][0]
            or 0.0
        )

    def _step(cur: DataFrame, dm_scalar: float | None) -> DataFrame:
        """One update. shuffle_hash hints: the ranks/contribs sides are O(V)
        rows — always the build side. A broadcast join would ship all ranks
        through the driver every iteration (impossible at 10^12 vertices);
        sort-merge would re-sort the cached edge table every round. SHJ
        against the hash-partitioned edges is the plan that survives
        scale-up — partition-local build ≈ V/n_part rows."""
        cur = cur.select("id", "rank")  # steps 2+ carry a dang column; drop it
        contribs = (
            edges_w.join(
                cur.withColumnRenamed("id", "src_id").hint("shuffle_hash"),
                "src_id",
            )
            .select(
                F.col("dst_id").alias("id"),
                (
                    F.col("rank") * F.col(weight_col) / F.col("out_degree")
                    if weight_col is not None
                    else F.col("rank") / F.col("out_degree")
                ).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        out = verts.join(contribs.hint("shuffle_hash"), "id", "left")
        if dm_scalar is not None:
            dangling_term = F.lit(dm_scalar / n)
        else:
            dm = (
                cur.join(verts.hint("shuffle_hash"), "id")
                .agg(F.sum(F.col("rank") * F.col("dang")).alias("_dm"))
            )
            out = out.crossJoin(F.broadcast(dm))
            dangling_term = F.coalesce(F.col("_dm"), F.lit(0.0)) / n
        return out.select(
            "id",
            "dang",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + dangling_term)
            ).alias("rank"),
        )

    # AQE off for the loop (see graph/iter_conf.py: pinned plans, measured
    # 3x on the bench corpus); `adaptive=True` opts back in for skew-split
    with iteration_conf(spark, disable_aqe=not adaptive):
        while it < max_iter and delta > tol:
            t0 = time.time()
            steps = min(max(1, check_every), max_iter - it)
            cur = ranks
            for _ in range(steps):
                cur = _step(cur, scalar_dangling)
            it += steps
            joined = (
                cur.join(
                    ranks.select("id", F.col("rank").alias("old_rank")).hint(
                        "shuffle_hash"
                    ),
                    "id",
                ).persist(StorageLevel.MEMORY_AND_DISK)
            )
            # the single per-chunk action: L1 delta across the chunk + the new
            # dangling mass (metrics only — the update itself reads it in-plan)
            stats = joined.agg(
                F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("delta"),
                F.sum(F.col("rank") * F.col("dang")).alias("dm"),
            ).collect()[0]
            delta = stats["delta"] or 0.0
            dangling_mass = stats["dm"] or 0.0
            if scalar_dangling is not None:
                scalar_dangling = dangling_mass  # feeds the next scalar-path step
            old = ranks
            ranks = joined.select("id", "rank")
            if checkpoint is not None and it % checkpoint_every < steps:
                ranks = checkpoint.save(ranks, it)
            elif steps > 1 or it % 2 == 0:
                # lazy: the truncated RDD materializes inside the NEXT chunk's
                # stats job instead of paying a dedicated job/barrier here.
                # Scalar path truncates every 2 iterations (plan growth is 2x
                # per iteration and `joined` is cached in between).
                ranks = ranks.localCheckpoint(eager=False)
            old.unpersist()
            # the stats action fully materialized `joined`; its predecessor's
            # cache blocks are now unreachable from live lineage heads — drop
            # them (leaving every chunk's frame cached OOMs a real cluster)
            if prev_joined is not None:
                prev_joined.unpersist()
            prev_joined = joined
            row = {
                "iteration": it,
                "l1_delta": float(delta),
                "dangling_mass": float(dangling_mass),
                "seconds": time.time() - t0,
            }
            history.append(row)
            if checkpoint is not None:
                checkpoint.log_metrics(
                    it,
                    l1_delta=row["l1_delta"],
                    dangling_mass=row["dangling_mass"],
                    seconds=row["seconds"],
                )

    # materialize the result BEFORE tearing down the caches it is lazily
    # derived from (a lazy final localCheckpoint would otherwise recompute
    # through the now-unpersisted edge/vertex frames at the caller's first
    # action), then release the final chunk's cached frame — the old code
    # leaked it for the session lifetime
    ranks = ranks.localCheckpoint(eager=True)
    if prev_joined is not None:
        prev_joined.unpersist()
    edges_w.unpersist()
    verts.unpersist()
    return PageRankResult(ranks=ranks, iterations=it, delta=float(delta), history=history)


def personalized_pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int | None = None,
    adaptive: bool = False,
) -> PageRankResult:
    """Personalized PageRank: restart vector concentrated on ``seeds``.

    r' = (1-d)·s + d·(Aᵀ r/outdeg + dangling_mass·s), r₀ = s, where
    s_i = 1/|S| on the seed set and 0 elsewhere — random walks teleport
    back to the seeds, so scores measure proximity to them (the standard
    seeded-relevance ranking over a link graph). Same execution shape as
    :func:`pagerank`: edges_w hash-partitioned+persisted once, shuffle_hash
    hints on the O(V) sides, lineage truncated every 2 iterations, ONE
    driver action per iteration (delta + dangling mass).
    """
    spark = vertices.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    out_deg = edges.groupBy(F.col("src_id").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    seed_ids = seeds.select("id").distinct()
    n_seeds = seed_ids.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank requires a non-empty seed set")
    verts = (
        vertices.select("id")
        .distinct()
        .join(out_deg, "id", "left")
        .join(seed_ids.withColumn("_is_seed", F.lit(True)), "id", "left")
        .select(
            "id",
            F.col("out_degree").isNull().cast("double").alias("dang"),
            F.when(F.col("_is_seed"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("sv"),
        )
        .repartition(n_part, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts.count()
    edges_w = (
        edges.join(out_deg.withColumnRenamed("id", "src_id"), "src_id")
        .repartition(n_part, "src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_w.count()

    ranks = verts.select("id", F.col("sv").alias("rank")).localCheckpoint(eager=True)
    dangling_mass = (
        ranks.join(verts.select("id", "dang"), "id")
        .agg(F.sum(F.col("rank") * F.col("dang")))
        .collect()[0][0]
        or 0.0
    )
    history: list[dict] = []
    delta = float("inf")
    it = 0
    prev_joined = None
    with iteration_conf(spark, disable_aqe=not adaptive):
        while it < max_iter and delta > tol:
            t0 = time.time()
            it += 1
            contribs = (
                edges_w.join(
                    ranks.withColumnRenamed("id", "src_id").hint("shuffle_hash"),
                    "src_id",
                )
                .select(
                    F.col("dst_id").alias("id"),
                    (F.col("rank") / F.col("out_degree")).alias("contrib"),
                )
                .groupBy("id")
                .agg(F.sum("contrib").alias("in_mass"))
            )
            joined = (
                verts.join(contribs.hint("shuffle_hash"), "id", "left")
                .join(
                    ranks.select("id", F.col("rank").alias("old_rank")).hint(
                        "shuffle_hash"
                    ),
                    "id",
                )
                .select(
                    "id",
                    "dang",
                    (
                        F.col("sv")
                        * (F.lit(1.0 - damping) + F.lit(damping * dangling_mass))
                        + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                    ).alias("rank"),
                    "old_rank",
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            stats = joined.agg(
                F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("delta"),
                F.sum(F.col("rank") * F.col("dang")).alias("dm"),
            ).collect()[0]
            delta = stats["delta"] or 0.0
            next_dangling = stats["dm"] or 0.0
            ranks = joined.select("id", "rank")
            if it % 2 == 0:
                ranks = ranks.localCheckpoint(eager=False)
            if prev_joined is not None:
                prev_joined.unpersist()
            prev_joined = joined
            history.append(
                {
                    "iteration": it,
                    "l1_delta": float(delta),
                    "dangling_mass": float(dangling_mass),
                    "seconds": time.time() - t0,
                }
            )
            dangling_mass = next_dangling

    ranks = ranks.localCheckpoint(eager=True)
    if prev_joined is not None:
        prev_joined.unpersist()
    edges_w.unpersist()
    verts.unpersist()
    return PageRankResult(ranks=ranks, iterations=it, delta=float(delta), history=history)


def katz_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    iterations: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, katz) — Katz centrality by fixed-point iteration:
    x' = α·Aᵀx + β (x₀ = β·1). Counts ALL walks into a vertex damped by
    length — unlike PageRank it does not split a source's influence by
    out-degree, so a hub endorses every target at full strength (the
    citation/endorsement reading). α must stay below 1/λ_max for the
    series to converge; the fixed-iteration form is the oracle-friendly
    truncation. Same execution shape as :func:`pagerank`: edges
    hash-partitioned+persisted once, per-iteration only the score vector
    shuffles, shuffle_hash hints on the O(V) sides, AQE off in the loop,
    lineage truncated every 2 rounds."""
    spark = vertices.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = (
        vertices.select("id").distinct().repartition(n_part, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_p = (
        edges.select("src_id", "dst_id")
        .repartition(n_part, "src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_p.count()
    scores = verts.select("id", F.lit(beta).alias("katz"))
    prev_cached = None
    with iteration_conf(spark, disable_aqe=True):
        for it in range(1, iterations + 1):
            contribs = (
                edges_p.join(
                    scores.select(
                        F.col("id").alias("src_id"), F.col("katz")
                    ).hint("shuffle_hash"),
                    "src_id",
                )
                .groupBy(F.col("dst_id").alias("id"))
                .agg(F.sum("katz").alias("in_sum"))
            )
            cached = (
                verts.join(contribs.hint("shuffle_hash"), "id", "left")
                .select(
                    "id",
                    (
                        F.lit(alpha) * F.coalesce("in_sum", F.lit(0.0))
                        + F.lit(beta)
                    ).alias("katz"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            if it % 2 == 0:
                # truncate lineage; unpersist must target `cached`, not the
                # checkpoint WRAPPER (a no-op on the cache-manager entry)
                scores = cached.localCheckpoint(eager=True)
            else:
                cached.count()
                scores = cached
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = cached
    out = scores.localCheckpoint(eager=True)
    if prev_cached is not None:
        prev_cached.unpersist()
    edges_p.unpersist()
    verts.unpersist()
    return out


def pagerank_fixed_iterations(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int,
    damping: float = 0.85,
    weight_col: str | None = None,
) -> DataFrame:
    """Exactly-k-iteration PageRank (no convergence test) — the oracle-
    friendly variant matched against unrolled SQL CTEs in DuckDB."""
    res = pagerank(
        vertices,
        edges,
        damping=damping,
        tol=-1.0,  # never converge early
        max_iter=iterations,
        weight_col=weight_col,
    )
    return res.ranks
