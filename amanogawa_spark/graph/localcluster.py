"""PPR sweep-cut local clustering (Andersen–Chung–Lang, FOCS 2006).

:mod:`amanogawa_spark.graph.push` gives the first half of the ACL local
clustering algorithm — a forward-push approximate personalized-PageRank
vector whose support is bounded by ``1/(alpha*eps)`` independent of
graph size.  This module supplies the second half: the SWEEP.  Order the
support by the degree-normalized score ``p(v)/d(v)``, and for every
prefix ``S_k`` of that order compute its conductance

    phi(S_k) = cut(S_k) / min(vol(S_k), vol(V) - vol(S_k))

over the UNDIRECTED canonicalized graph (ACL is stated for undirected
graphs; the web graph is symmetrized the same way the reference's
to_graph flow canonicalizes edges — see reference `to_graph.cpp` edge
dedup, mirrored in :mod:`amanogawa_spark.graph.build`).  The prefix with
the smallest conductance is the local cluster around the seeds; the ACL
theorem guarantees a prefix within a quadratic factor of the best
conductance cut containing the seed.

Scale shape — the part that must survive 100 TB:

* The sweep frame is the PUSH SUPPORT, not the graph: at most
  ``1/(alpha*eps)`` rows regardless of |V|.  The global ``row_number``
  window over it is a single-partition sort of a bounded-small frame —
  acceptable by construction, and asserted small at runtime.
* The graph-sized work is two broadcast hash joins (edge endpoints
  against the tiny rank table) followed by two map-side-combined
  histogram aggregates keyed by sweep rank — one pass over the edges,
  no edge-table shuffle.
* Cumulative sums (volume, cut) run over the bounded sweep frame only.

Determinism / oracle portability: the push trajectory is rounded to 12
decimals per round (see :func:`~amanogawa_spark.graph.push.forward_push_ppr`),
so ``p`` is bitwise engine-portable; the sweep orders by the exact
double ``p/d`` with the vertex id as tiebreak, and DuckDB computes the
identical division of identical doubles — the whole sweep table
hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNRANKED = 2**62  # sentinel rank for vertices outside the sweep support


def undirected_degrees(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Canonical undirected edge set and its (id, d) degree table."""
    und = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    return und, deg


def ppr_sweep_cut(edges: DataFrame, ppr: DataFrame) -> DataFrame:
    """Sweep table: one row per support vertex, in sweep order.

    ``edges`` is the directed (src_id, dst_id) table; ``ppr`` carries
    (id, ppr_est) — typically :func:`forward_push_ppr` output.  Returns
    ``(sweep_k, id, vol_s, cut_s, conductance_r)`` where ``sweep_k`` is
    the 1-based position in the p/d ordering, ``vol_s``/``cut_s`` are the
    volume and cut of the prefix ending at that vertex, and
    ``conductance_r`` is phi(S_k) rounded to 8 decimals (1.0 when the
    smaller side has zero volume).  Support vertices with zero undirected
    degree cannot change any cut and are excluded (inner join on the
    degree table); pick the min-conductance row for the ACL cluster.
    """
    und, deg = undirected_degrees(edges)

    support = (
        ppr.filter(F.col("ppr_est") > 0)
        .select("id", "ppr_est")
        .join(deg, "id")  # zero-degree seeds carry no volume: excluded
    )
    # The support is push-bounded (<= 1/(alpha*eps)); a global order
    # window over it is a bounded single-partition sort by construction.
    w = Window.orderBy((F.col("ppr_est") / F.col("d")).desc(), F.col("id").asc())
    ranked = support.select(
        "id", "d", F.row_number().over(w).cast("long").alias("k")
    ).localCheckpoint(eager=True)

    rank_a = ranked.select(F.col("id").alias("a"), F.col("k").alias("ka"))
    rank_b = ranked.select(F.col("id").alias("b"), F.col("k").alias("kb"))
    er = (
        und.join(F.broadcast(rank_a), "a", "left")
        .join(F.broadcast(rank_b), "b", "left")
        .select(
            F.least(
                F.coalesce("ka", F.lit(_UNRANKED)),
                F.coalesce("kb", F.lit(_UNRANKED)),
            ).alias("kmin"),
            F.greatest(
                F.coalesce("ka", F.lit(_UNRANKED)),
                F.coalesce("kb", F.lit(_UNRANKED)),
            ).alias("kmax"),
        )
    )
    # histogram of edges entering the prefix boundary (first endpoint
    # swept in) and closing (second endpoint swept in); both are
    # map-side-combined aggregates onto the bounded rank domain
    opens = (
        er.filter(F.col("kmin") < _UNRANKED)
        .groupBy(F.col("kmin").alias("k"))
        .agg(F.count("*").alias("n_open"))
    )
    closes = (
        er.filter(F.col("kmax") < _UNRANKED)
        .groupBy(F.col("kmax").alias("k"))
        .agg(F.count("*").alias("n_close"))
    )

    vol_total = deg.agg(F.sum("d").alias("vt"))
    cw = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(F.broadcast(opens), "k", "left")
        .join(F.broadcast(closes), "k", "left")
        .select(
            "k",
            "id",
            F.sum("d").over(cw).alias("vol_s"),
            (
                F.sum(F.coalesce("n_open", F.lit(0))).over(cw)
                - F.sum(F.coalesce("n_close", F.lit(0))).over(cw)
            ).alias("cut_s"),
        )
        .crossJoin(F.broadcast(vol_total))
    )
    denom = F.least(F.col("vol_s"), F.col("vt") - F.col("vol_s"))
    return sweep.select(
        F.col("k").alias("sweep_k"),
        "id",
        "vol_s",
        "cut_s",
        F.round(
            F.when(denom > 0, F.col("cut_s").cast("double") / denom).otherwise(
                F.lit(1.0)
            ),
            8,
        ).alias("conductance_r"),
    )


def local_cluster(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.15,
    eps: float = 1e-6,
    fixed_rounds: int | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """ACL local cluster membership: the min-conductance sweep prefix.

    Runs :func:`forward_push_ppr` from ``seeds`` and returns the member
    rows ``(id, sweep_k, conductance_r)`` of the best prefix — the
    smallest-``sweep_k`` prefix attaining the minimum conductance, so
    ties resolve deterministically.
    """
    from amanogawa_spark.graph.push import forward_push_ppr

    ppr = forward_push_ppr(
        edges,
        seeds,
        alpha=alpha,
        eps=eps,
        fixed_rounds=fixed_rounds,
        max_rounds=max_rounds,
    )
    sweep = ppr_sweep_cut(edges, ppr).localCheckpoint(eager=True)
    best = sweep.orderBy(
        F.col("conductance_r").asc(), F.col("sweep_k").asc()
    ).limit(1)
    best_k = F.broadcast(best.select(F.col("sweep_k").alias("best_k")))
    return (
        sweep.crossJoin(best_k)
        .filter(F.col("sweep_k") <= F.col("best_k"))
        .select("id", "sweep_k", "conductance_r")
    )


def ppr_sweep_cut_batch(edges: DataFrame, ppr: DataFrame) -> DataFrame:
    """Batched sweep: ``ppr`` carries (query_id, id, ppr_est) — typically
    :func:`forward_push_ppr_batch` output — and the result adds a
    ``query_id`` column to the :func:`ppr_sweep_cut` schema.

    SCALE SHAPE IMPROVES over the single-query sweep: every window here is
    ``partitionBy(query_id)`` over one query's push-bounded support, so
    there is no global-order window at all — thousands of sweeps rank and
    cumulate in parallel. The edge table is touched once; an edge is
    replicated only to the queries whose support contains one of its
    endpoints (candidate union of the two endpoint joins).
    """
    und, deg = undirected_degrees(edges)

    support = (
        ppr.filter(F.col("ppr_est") > 0)
        .select("query_id", "id", "ppr_est")
        .join(deg, "id")
    )
    w = Window.partitionBy("query_id").orderBy(
        (F.col("ppr_est") / F.col("d")).desc(), F.col("id").asc()
    )
    ranked = support.select(
        "query_id", "id", "d", F.row_number().over(w).cast("long").alias("k")
    ).localCheckpoint(eager=True)

    rank_a = ranked.select(
        "query_id", F.col("id").alias("a"), F.col("k").alias("ka")
    )
    rank_b = ranked.select(
        "query_id", F.col("id").alias("b"), F.col("k").alias("kb")
    )
    # candidate (query, edge) pairs: union of the two endpoint matches —
    # an edge reaches only the queries that touched one of its endpoints
    cand = (
        und.join(F.broadcast(rank_a.select("query_id", "a")), "a")
        .select("query_id", "a", "b")
        .unionAll(
            und.join(F.broadcast(rank_b.select("query_id", "b")), "b").select(
                "query_id", "a", "b"
            )
        )
        .distinct()
    )
    er = (
        cand.join(F.broadcast(rank_a), ["query_id", "a"], "left")
        .join(F.broadcast(rank_b), ["query_id", "b"], "left")
        .select(
            "query_id",
            F.least(
                F.coalesce("ka", F.lit(_UNRANKED)),
                F.coalesce("kb", F.lit(_UNRANKED)),
            ).alias("kmin"),
            F.greatest(
                F.coalesce("ka", F.lit(_UNRANKED)),
                F.coalesce("kb", F.lit(_UNRANKED)),
            ).alias("kmax"),
        )
    )
    opens = (
        er.filter(F.col("kmin") < _UNRANKED)
        .groupBy("query_id", F.col("kmin").alias("k"))
        .agg(F.count("*").alias("n_open"))
    )
    closes = (
        er.filter(F.col("kmax") < _UNRANKED)
        .groupBy("query_id", F.col("kmax").alias("k"))
        .agg(F.count("*").alias("n_close"))
    )

    vol_total = deg.agg(F.sum("d").alias("vt"))
    cw = (
        Window.partitionBy("query_id")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = (
        ranked.join(F.broadcast(opens), ["query_id", "k"], "left")
        .join(F.broadcast(closes), ["query_id", "k"], "left")
        .select(
            "query_id",
            "k",
            "id",
            F.sum("d").over(cw).alias("vol_s"),
            (
                F.sum(F.coalesce("n_open", F.lit(0))).over(cw)
                - F.sum(F.coalesce("n_close", F.lit(0))).over(cw)
            ).alias("cut_s"),
        )
        .crossJoin(F.broadcast(vol_total))
    )
    denom = F.least(F.col("vol_s"), F.col("vt") - F.col("vol_s"))
    return sweep.select(
        "query_id",
        F.col("k").alias("sweep_k"),
        "id",
        "vol_s",
        "cut_s",
        F.round(
            F.when(denom > 0, F.col("cut_s").cast("double") / denom).otherwise(
                F.lit(1.0)
            ),
            8,
        ).alias("conductance_r"),
    )


def local_cluster_batch(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.15,
    eps: float = 1e-6,
    fixed_rounds: int | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """Batched ACL clusters: (query_id, id, sweep_k, conductance_r) — the
    min-conductance sweep prefix PER QUERY, all queries in one job.
    ``seeds`` carries (query_id, id)."""
    from amanogawa_spark.graph.push import forward_push_ppr_batch

    ppr = forward_push_ppr_batch(
        edges,
        seeds,
        alpha=alpha,
        eps=eps,
        fixed_rounds=fixed_rounds,
        max_rounds=max_rounds,
    )
    sweep = ppr_sweep_cut_batch(edges, ppr).localCheckpoint(eager=True)
    bw = Window.partitionBy("query_id").orderBy(
        F.col("conductance_r").asc(), F.col("sweep_k").asc()
    )
    best = (
        sweep.select(
            "query_id", "sweep_k", F.row_number().over(bw).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("sweep_k").alias("best_k"))
    )
    return (
        sweep.join(F.broadcast(best), "query_id")
        .filter(F.col("sweep_k") <= F.col("best_k"))
        .select("query_id", "id", "sweep_k", "conductance_r")
    )
