"""Forward-push approximate personalized PageRank (Andersen–Chung–Lang).

:func:`personalized_pagerank` does work proportional to |E| every
iteration — right when you want scores for ALL vertices. For per-seed
queries (related-pages, seed-expansion crawl steering) the published
local algorithm is forward push (Andersen, Chung, Lang, "Local Graph
Partitioning using PageRank Vectors", FOCS 2006): maintain an estimate
``p`` and a residual ``r`` (r starts as the seed vector), repeatedly
convert residual to estimate at the active vertices (p += α·r) and push
the rest (``(1−α)·r``) to out-neighbors, until every residual is below
``eps``. Total pushed mass is bounded by 1/(α·eps) INDEPENDENT of graph
size — only the neighborhood of the seeds is ever touched.

This is the synchronous batch variant: every above-threshold vertex
pushes each round (the sequential queue order of the paper is
meaningless on a cluster; synchronous rounds keep the result
deterministic and let one round be one co-partitioned join). The
invariant ``p(v) + contributions-of-r`` telescopes exactly as in the
paper, so the estimate converges to PPR from below with
``|ppr − p|₁ ≤ |r|₁``.

Scale shape per round: residuals live in a skinny (id, r) frame;
the push is edges ⋈ active-residuals (shuffle_hash on the frontier,
which is SMALL — this is the whole point), one map-side-combined
aggregate onto dst, and a union-aggregate to fold pushed mass into the
next residual. Dangling active vertices return their push mass to the
seed vector (the same teleport-to-seeds convention as
:func:`personalized_pagerank`). No step touches O(V) rows unless the
frontier genuinely is O(V).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def forward_push_ppr(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.15,
    eps: float = 1e-4,
    max_rounds: int = 50,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """(id, ppr_est, residual): lower-bound PPR estimates from ``seeds``.

    ``alpha`` is the teleport probability (the paper's α; matches
    damping d = 1−α elsewhere). A vertex is active while
    ``residual > eps`` (absolute threshold — the degree-scaled variant
    trades accuracy bounds for fewer rounds; absolute keeps the oracle
    mirror simple and the error bound |r|₁ ≤ eps·|touched|).
    ``fixed_rounds`` runs exactly that many synchronous rounds with no
    driver action in the loop (the oracle-friendly variant); otherwise
    rounds stop when no residual exceeds ``eps`` or at ``max_rounds``.
    """
    out_deg = edges.groupBy(F.col("src_id").alias("id")).agg(
        F.count("*").alias("od")
    )
    n_seeds = seeds.select("id").distinct().count()
    if n_seeds == 0:
        raise ValueError("forward_push_ppr requires a non-empty seed set")
    sv = seeds.select("id").distinct().withColumn("s", F.lit(1.0 / n_seeds))

    # state: (id, p, r); seed residual 1/|S|
    state = sv.select("id", F.lit(0.0).alias("p"), F.col("s").alias("r"))
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    check_convergence = fixed_rounds is None

    for rnd in range(rounds):
        if check_convergence:
            if state.filter(F.col("r") > eps).limit(1).count() == 0:
                break
        active = state.filter(F.col("r") > eps)
        inactive = state.filter(~(F.col("r") > eps))
        # estimates absorb alpha*r at active vertices; their residual resets
        settled = active.select(
            "id", (F.col("p") + F.lit(alpha) * F.col("r")).alias("p")
        )
        act = active.join(out_deg, "id", "left").select(
            "id", "r", F.col("od")
        )
        # non-dangling actives push (1-alpha)*r/od along each out-edge
        pushed = (
            edges.join(
                act.filter(F.col("od").isNotNull())
                .select(F.col("id").alias("src_id"), "r", "od")
                .hint("shuffle_hash"),
                "src_id",
            )
            .select(
                F.col("dst_id").alias("id"),
                (F.lit(1.0 - alpha) * F.col("r") / F.col("od")).alias("dr"),
            )
            .groupBy("id")
            .agg(F.sum("dr").alias("dr"))
        )
        # dangling actives teleport their push mass back to the seed vector
        dang_mass_df = act.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
        )
        dang_pushed = dang_mass_df.crossJoin(sv).select(
            "id", (F.lit(1.0 - alpha) * F.col("dm") * F.col("s")).alias("dr")
        )
        # next state: settled p, inactive carry-over, plus new residual mass
        parts = [
            settled.select("id", "p", F.lit(0.0).alias("r")),
            inactive.select("id", "p", "r"),
            pushed.select("id", F.lit(0.0).alias("p"), F.col("dr").alias("r")),
            dang_pushed.select(
                "id", F.lit(0.0).alias("p"), F.col("dr").alias("r")
            ),
        ]
        u = parts[0]
        for x in parts[1:]:
            u = u.unionAll(x)
        # state rounds to 12 decimals: the active-set test (r > eps) must
        # not depend on last-ulp summation order — 1e-12/round is far
        # below any useful eps, and it makes the whole trajectory
        # engine-portable (the oracle mirrors the same rounding)
        # eager checkpoint EVERY round: the round references `state`
        # 3-4 times (probe, active, inactive), so an unmaterialized
        # lineage would fan out ~4x per round; one small job per round
        # truncates it, and superseded checkpoint storage is released by
        # the context cleaner when the reference drops
        state = u.groupBy("id").agg(
            F.round(F.sum("p"), 12).alias("p"),
            F.round(F.sum("r"), 12).alias("r"),
        ).localCheckpoint(eager=True)

    return state.select(
        "id", F.col("p").alias("ppr_est"), F.col("r").alias("residual")
    )


def forward_push_ppr_batch(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.15,
    eps: float = 1e-4,
    max_rounds: int = 50,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """(query_id, id, ppr_est, residual): many seed sets, ONE job.

    The production related-pages / seed-expansion shape: thousands of PPR
    queries answered together — ``seeds`` carries (query_id, id) and every
    round pushes ALL queries' residuals in the same co-keyed joins, so the
    per-round fixed cost (job launch, shuffle barriers) amortizes across
    the batch instead of multiplying by it. State is keyed (query_id, id);
    each query's support stays push-bounded exactly as in
    :func:`forward_push_ppr`, and the semantics per query are identical
    (pytest pins batch == per-seed single runs).
    """
    out_deg = edges.groupBy(F.col("src_id").alias("id")).agg(
        F.count("*").alias("od")
    )
    sizes = (
        seeds.select("query_id", "id")
        .distinct()
        .groupBy("query_id")
        .agg(F.count("*").alias("ns"))
    )
    if sizes.limit(1).count() == 0:
        raise ValueError("forward_push_ppr_batch requires a non-empty seed set")
    sv = (
        seeds.select("query_id", "id")
        .distinct()
        .join(sizes, "query_id")
        .select("query_id", "id", (F.lit(1.0) / F.col("ns")).alias("s"))
        .localCheckpoint(eager=True)
    )

    state = sv.select(
        "query_id", "id", F.lit(0.0).alias("p"), F.col("s").alias("r")
    )
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    check_convergence = fixed_rounds is None

    for _rnd in range(rounds):
        if check_convergence:
            if state.filter(F.col("r") > eps).limit(1).count() == 0:
                break
        active = state.filter(F.col("r") > eps)
        inactive = state.filter(~(F.col("r") > eps))
        settled = active.select(
            "query_id", "id", (F.col("p") + F.lit(alpha) * F.col("r")).alias("p")
        )
        act = active.join(out_deg, "id", "left").select(
            "query_id", "id", "r", "od"
        )
        pushed = (
            edges.join(
                act.filter(F.col("od").isNotNull())
                .select("query_id", F.col("id").alias("src_id"), "r", "od")
                .hint("shuffle_hash"),
                "src_id",
            )
            .select(
                "query_id",
                F.col("dst_id").alias("id"),
                (F.lit(1.0 - alpha) * F.col("r") / F.col("od")).alias("dr"),
            )
            .groupBy("query_id", "id")
            .agg(F.sum("dr").alias("dr"))
        )
        # dangling actives teleport their mass back to THEIR query's seeds
        dang = (
            act.filter(F.col("od").isNull())
            .groupBy("query_id")
            .agg(F.sum("r").alias("dm"))
        )
        dang_pushed = dang.join(sv, "query_id").select(
            "query_id",
            "id",
            (F.lit(1.0 - alpha) * F.col("dm") * F.col("s")).alias("dr"),
        )
        parts = [
            settled.select("query_id", "id", "p", F.lit(0.0).alias("r")),
            inactive.select("query_id", "id", "p", "r"),
            pushed.select(
                "query_id", "id", F.lit(0.0).alias("p"), F.col("dr").alias("r")
            ),
            dang_pushed.select(
                "query_id", "id", F.lit(0.0).alias("p"), F.col("dr").alias("r")
            ),
        ]
        u = parts[0]
        for x in parts[1:]:
            u = u.unionAll(x)
        # same 12-dec portable rounding + per-round checkpoint discipline
        # as the single-query loop (see comments there)
        state = u.groupBy("query_id", "id").agg(
            F.round(F.sum("p"), 12).alias("p"),
            F.round(F.sum("r"), 12).alias("r"),
        ).localCheckpoint(eager=True)

    return state.select(
        "query_id", "id", F.col("p").alias("ppr_est"), F.col("r").alias("residual")
    )
