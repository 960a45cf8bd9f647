"""Incremental PageRank: update converged ranks from a recrawl edge diff.

A production web graph is recrawled continuously; between snapshots only
a tiny fraction of pages change their out-links (``graph/diff.py``
measures exactly that churn). Recomputing PageRank from scratch does
O(|E|) work per iteration; the published alternative (Ohsaka, Maehara,
Kawarabayashi, "Efficient PageRank Tracking in Evolving Networks",
KDD 2015 — itself a residual-push formulation in the Andersen-Chung-Lang
family, cf. ``graph/push.py``) repairs the old solution with work
proportional to the CHANGED NEIGHBORHOOD instead.

Derivation (linear, so the repair is exact up to the stop threshold):
with teleport ``(1-d)·u`` (u = uniform 1/n) and the dangling-mass
redistribution operator ``M x = d·(Pᵀx + dang(x)·u)`` the two snapshots
satisfy ``π_old = (1-d)u + M_old π_old`` and ``π_new = (1-d)u + M_new π_new``,
hence

    π_new − π_old = (I − M_new)⁻¹ ρ₀,   ρ₀ = (M_new − M_old) π_old.

``ρ₀`` is supported ONLY on the out-neighborhoods of vertices whose edge
set changed (plus a scalar·uniform component from dangling-status
flips) — |diff|-sized, not |E|-sized. The geometric expansion
``Σ_k M_new^k ρ₀`` is evaluated with the sparse part pushed through the
edge table round by round (each round multiplies the mass by d, so
convergence is geometric) while every uniform component ever spawned
(dangling pushes) is folded ANALYTICALLY through the closed form

    (I − M_new)⁻¹ u = π_new / (1-d)
    ⇒ π_new = (π_old + S) / (1 − C/(1-d))

where ``S`` is the accumulated sparse mass and ``C`` the accumulated
uniform coefficient. No O(n) uniform vector is ever materialized.

Scale shape per round: the residual lives in a skinny (id, r) frame that
starts |diff|-neighborhood-sized; one shuffle_hash join against the new
edge table + one map-side-combined aggregate onto dst, all in-plan —
the dangling coefficient accumulates on a sentinel row, so the only
driver barrier is the convergence probe every ``check_every`` rounds
over lazy localCheckpoints. A recrawl that touches 0.1% of a 10^12-page
graph costs ~0.1%-neighborhood × ~40 rounds instead of |E| × ~60
iterations (sandbox: repair 32 s vs 43 s cold on a graph SMALL enough
that barriers, not data, dominate — the scale gap only widens).

Contract: both snapshots share one vertex universe (``old_ranks`` rows).
Newly discovered pages need a rank row first — extend ``old_ranks`` with
mass 0 and let the repair pull them up, or fall back to
``pagerank(..., initial_ranks=old_ranks)`` when the universe itself
changes materially (teleport mass shifts by Δn/n, which this repair
does not model).

Reference anchor: the reference engine has no incremental path — its
convergence driver (iterate.h:21-63) always restarts; this operator is
the engine-side addition the north rule's resumable-recrawl story needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.graph.diff import edge_diff
from amanogawa_spark.graph.iter_conf import iteration_conf
from amanogawa_spark.graph.pagerank import PageRankResult


def _out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src_id").alias("id")).agg(
        F.count("*").cast("double").alias("od")
    )


def incremental_pagerank(
    old_ranks: DataFrame,
    old_edges: DataFrame,
    new_edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_rounds: int = 200,
    fixed_rounds: int | None = None,
    check_every: int = 4,
) -> PageRankResult:
    """Repair ``old_ranks`` (id, rank) to the new edge snapshot.

    ``tol``: stop when the sparse residual's L1 falls to ``tol`` — the
    same effective accuracy as ``pagerank(tol=...)``'s successive-delta
    test (both bound the true L1 error by ``tol·d/(1-d)``), so
    repair-vs-cold comparisons at equal ``tol`` are apples-to-apples.

    ``check_every``: rounds between convergence-check driver actions.
    The dangling-mass coefficient needs NO action at all: dangling
    residual routes in-plan to a sentinel accumulator row (NULL id —
    groups with itself in aggregates, joins with nothing, and collides
    with no id space, hash ids included), so the only barrier is the L1
    probe — k rounds share one. Overshoot is ≤ k−1 rounds, all of them
    accuracy-improving.

    ``fixed_rounds``: run exactly that many push rounds with NO driver
    action inside the loop — the engine-portable variant the value
    oracle mirrors in SQL (the sentinel C-fold still applies, so
    dangling snapshots are handled; the mirror itself targets a
    dangling-free fixture where C = 0).
    """
    d = float(damping)
    diff = edge_diff(old_edges, new_edges)
    changed = diff.select(F.col("src_id").alias("id")).distinct()

    spark = old_ranks.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    od_old = _out_degrees(old_edges)
    od_new = _out_degrees(new_edges).repartition(n_part, "id").persist()

    # rank mass + degrees of the changed sources — |diff|-sized, so
    # broadcast THOSE into both edge scans rather than shuffling either
    # snapshot or materializing an O(V) broadcast
    pi_c = old_ranks.join(F.broadcast(changed), "id").select(
        F.col("id").alias("src_id"), F.col("rank").alias("pr")
    )
    od_new_c = od_new.join(
        F.broadcast(changed), "id"
    ).withColumnRenamed("id", "src_id")
    od_old_c = od_old.join(
        F.broadcast(changed), "id"
    ).withColumnRenamed("id", "src_id")
    new_side = (
        new_edges.join(F.broadcast(pi_c), "src_id")
        .join(F.broadcast(od_new_c), "src_id")
        .select(
            F.col("dst_id").alias("id"),
            (F.lit(d) * F.col("pr") / F.col("od")).alias("r"),
        )
    )
    old_side = (
        old_edges.join(F.broadcast(pi_c), "src_id")
        .join(F.broadcast(od_old_c), "src_id")
        .select(
            F.col("dst_id").alias("id"),
            (-F.lit(d) * F.col("pr") / F.col("od")).alias("r"),
        )
    )
    # sigma_0: sparse part of (M_new - M_old) pi_old; 12-dec rounding makes
    # the whole trajectory engine-portable (same convention as push.py)
    state = (
        new_side.unionAll(old_side)
        .groupBy("id")
        .agg(F.round(F.sum("r"), 12).alias("r"))
        .filter(F.col("r") != 0.0)
        .select("id", F.lit(0.0).alias("p"), "r")
        .localCheckpoint(eager=True)
    )

    history: list[dict] = []
    # uniform coefficient of rho_0: dangling-status flips among the
    # changed sources re-aim d·pi_old(u) of uniform spray
    flip = (
        changed.join(old_ranks, "id")
        .join(od_old.withColumnRenamed("od", "od_o"), "id", "left")
        .join(od_new.withColumnRenamed("od", "od_n"), "id", "left")
        .select(
            (
                F.col("rank")
                * (
                    F.col("od_n").isNull().cast("double")
                    - F.col("od_o").isNull().cast("double")
                )
            ).alias("c")
        )
        .agg(F.coalesce(F.sum("c"), F.lit(0.0)).alias("c"))
        .collect()[0]["c"]
    )
    c_acc = d * float(flip)

    # degree-annotated edge table, built ONCE and reused every push round
    # (the same one-time join pagerank() makes; partitioned on the join
    # key so each round shuffles only the frontier-sized residual side)
    edges_od = (
        new_edges.select("src_id", "dst_id")
        .join(od_new.withColumnRenamed("id", "src_id"), "src_id")
        .repartition(n_part, "src_id")
        .persist()
    )

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    # stop when the residual L1 reaches tol — the SAME effective accuracy
    # as pagerank()'s successive-delta test: both leave a true L1 error
    # bounded by tol·d/(1-d) (cold: |r_k − r_{k-1}| ≤ tol ⇒ error ≤
    # tol·d/(1-d); here: remaining tail ≤ |σ|₁·d/(1-d)). Holding the
    # repair to a stricter stop than the cold path it replaces would
    # just pad ~log(d/(1-d))/log(1/d) ≈ 11 rounds of false precision.
    stop_l1 = tol
    delta = float("inf")
    it = 0
    # AQE off for the loop: pinned plans, explicit shuffle_hash hints,
    # fixed partitioning (see graph/iter_conf.py for the measured basis)
    with iteration_conf(spark):
        for it in range(1, rounds + 1):
            if fixed_rounds is None and (it - 1) % check_every == 0:
                # the ONLY in-loop driver barrier: k rounds share one L1 probe
                # over the skinny residual (lazy checkpoints materialize here)
                delta = float(
                    state.filter(F.col("id").isNotNull())
                    .agg(F.coalesce(F.sum(F.abs(F.col("r"))), F.lit(0.0)).alias("l1"))
                    .collect()[0]["l1"]
                )
                history.append({"round": it - 1, "residual_l1": delta})
                if delta <= stop_l1:
                    it -= 1
                    break
            pushed = (
                edges_od.join(
                    state.select(F.col("id").alias("src_id"), "r")
                    .hint("shuffle_hash"),
                    "src_id",
                )
                .select(
                    F.col("dst_id").alias("id"),
                    (F.lit(d) * F.col("r") / F.col("od")).alias("dr"),
                )
            )
            # dangling residual re-aims d·r of uniform spray: accumulate the
            # coefficient in-plan on the sentinel row instead of a per-round
            # scalar action (1-row aggregate; empty residual yields p = 0)
            dang_sent = (
                state.join(od_new, "id", "left")
                .filter(F.col("od").isNull() & F.col("id").isNotNull())
                .agg(F.coalesce(F.sum(F.lit(d) * F.col("r")), F.lit(0.0)).alias("p"))
                .select(
                    F.lit(None).cast("long").alias("id"), "p", F.lit(0.0).alias("r")
                )
            )
            nxt = (
                state.select("id", (F.col("p") + F.col("r")).alias("p"), F.lit(0.0).alias("r"))
                .unionAll(
                    pushed.select("id", F.lit(0.0).alias("p"), F.col("dr").alias("r"))
                )
                .unionAll(dang_sent)
                .groupBy("id")
                .agg(
                    F.round(F.sum("p"), 12).alias("p"),
                    F.round(F.sum("r"), 12).alias("r"),
                )
                # lazy: truncates the logical plan NOW, computes at the next
                # probe — k rounds roll into one job instead of k barriers
                .localCheckpoint(eager=False)
            )
            state = nxt

        # one closing action: remaining-residual L1 + the sentinel coefficient

    fin = state.select(
        F.sum(F.when(F.col("id").isNotNull(), F.abs(F.col("r")))).alias("l1"),
        F.sum(F.when(F.col("id").isNull(), F.col("p"))).alias("c"),
    ).collect()[0]
    delta = float(fin["l1"] or 0.0)
    c_acc += float(fin["c"] or 0.0)

    scale = 1.0 / (1.0 - c_acc / (1.0 - d))
    repaired = (
        old_ranks.join(
            state.filter(F.col("id").isNotNull())
            .select("id", (F.col("p") + F.col("r")).alias("s")),
            "id",
            "left",
        )
        .select(
            "id",
            (
                (F.col("rank") + F.coalesce(F.col("s"), F.lit(0.0)))
                * F.lit(scale)
            ).alias("rank"),
        )
    )
    od_new.unpersist()
    edges_od.unpersist()
    return PageRankResult(ranks=repaired, iterations=it, delta=delta, history=history)


def incremental_components(
    old_labels: DataFrame,
    old_edges: DataFrame,
    new_edges: DataFrame,
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component): repair a min-id CC assignment after a recrawl diff
    — deletion-tolerant, unlike the append-only warm start in
    ``connected_components(initial=...)``.

    Two facts bound the repair to churn-sized work:

    - a REMOVED edge can only split the component it lived in, so the
      star cascade reruns ONLY on the subgraph induced by components
      that lost an edge (old components are closed under old edges —
      nothing outside them can be affected by the split);
    - an ADDED edge can only merge components, so after the splits are
      repaired every added edge contracts to a (label_u, label_v) pair
      and one CC pass over that |added|-sized contracted graph yields
      the merge map.

    Because every label is its component's minimum member id at each
    stage, the composed result is EXACTLY the cold assignment on the
    new snapshot (pytest pins equality, splits and merges included).

    Same universe contract as :func:`incremental_pagerank`: vertices are
    ``old_labels`` rows; extend it with (id, id) rows for newly
    discovered pages first.
    """
    from amanogawa_spark.graph.components import connected_components

    diff = edge_diff(old_edges, new_edges).persist()
    removed = diff.filter(F.col("change") == "removed")
    added = diff.filter(F.col("change") == "added")

    # components that lost an edge; their member vertices
    aff = (
        removed.select(F.col("src_id").alias("id"))
        .unionAll(removed.select(F.col("dst_id").alias("id")))
        .distinct()
        .join(old_labels, "id")
        .select("component")
        .distinct()
    )
    vaff = old_labels.join(aff, "component").select("id").persist()

    # rerun the star cascade on the induced subgraph (both endpoints
    # inside an affected component) — churn-sized, not |E|-sized
    e_in = new_edges.select("src_id", "dst_id").join(
        vaff.withColumnRenamed("id", "src_id"), "src_id"
    ).join(vaff.withColumnRenamed("id", "dst_id"), "dst_id")
    sub = connected_components(vaff, e_in, max_rounds=max_rounds)

    base = (
        old_labels.join(aff, "component", "anti")
        .select("id", "component")
        .unionByName(sub)
    )

    # contract added edges to label pairs; CC over the tiny label graph
    lab_u = base.select(
        F.col("id").alias("src_id"), F.col("component").alias("lu")
    )
    lab_v = base.select(
        F.col("id").alias("dst_id"), F.col("component").alias("lv")
    )
    contracted = (
        added.select("src_id", "dst_id")
        .join(lab_u, "src_id")
        .join(lab_v, "dst_id")
        .filter(F.col("lu") != F.col("lv"))
        .select(F.col("lu").alias("src_id"), F.col("lv").alias("dst_id"))
    )
    cverts = (
        contracted.select(F.col("src_id").alias("id"))
        .unionAll(contracted.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    merge_map = connected_components(cverts, contracted, max_rounds=max_rounds).select(
        F.col("id").alias("component"), F.col("component").alias("merged")
    )

    out = (
        base.join(merge_map, "component", "left")
        .select(
            "id", F.coalesce("merged", F.col("component")).alias("component")
        )
        .localCheckpoint(eager=True)
    )
    diff.unpersist()
    vaff.unpersist()
    return out


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """(a, b) with a < b, deduped, self-loops dropped — triangle semantics."""
    return (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )


def _triangles_touching(x: DataFrame, g: DataFrame) -> DataFrame:
    """1-row (n): triangles of undirected graph ``g`` that contain at
    least one edge of ``x`` (x ⊆ g, both canonical (a,b) a<b).

    Inclusion–exclusion over how many x-edges a triangle contains:
    N≥1 = Σ₁ − Σ₂ + Σ₃ with
      Σ₁ = Σ_{e∈x} |common neighbours of e's endpoints in g|   (m·N_m)
      Σ₂ = wedges of two x-edges closed by a g-edge             (C(m,2)·N_m)
      Σ₃ = triangles entirely inside x                          (C(m,3)·N_m)
    Everything is x-anchored: g's full edge set is only ever the probe
    side of semi-join-shaped lookups, so the work follows the diff size
    (plus the adjacency of the touched endpoints), not |g|.
    """
    from amanogawa_spark.graph.triangles import triangle_total

    adj = g.select(F.col("a").alias("p"), F.col("b").alias("w")).unionAll(
        g.select(F.col("b").alias("p"), F.col("a").alias("w"))
    )
    # sigma1: for each x-edge (a,b), |N(a) ∩ N(b)|
    s1_df = (
        x.join(adj.withColumnRenamed("p", "a"), "a")
        .join(
            adj.select(F.col("p").alias("b"), F.col("w").alias("w")),
            ["b", "w"],
            "semi",
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    # sigma2: unordered pairs of x-edges sharing a pivot, third side in g
    xadj = x.select(F.col("a").alias("p"), F.col("b").alias("w")).unionAll(
        x.select(F.col("b").alias("p"), F.col("a").alias("w"))
    )
    s2_df = (
        xadj.select("p", F.col("w").alias("x1"))
        .join(xadj.select("p", F.col("w").alias("y1")), "p")
        .filter(F.col("x1") < F.col("y1"))
        .select(F.col("x1").alias("a"), F.col("y1").alias("b"))
        .join(g, ["a", "b"], "semi")
        .agg(F.count("*").cast("long").alias("n"))
    )
    s3_df = triangle_total(
        x.select(F.col("a").alias("src_id"), F.col("b").alias("dst_id"))
    ).select(F.col("n_triangles").alias("n"))
    s1 = s1_df.collect()[0]["n"]
    s2 = s2_df.collect()[0]["n"]
    s3 = s3_df.collect()[0]["n"]
    spark = x.sparkSession
    return spark.createDataFrame([(int(s1 - s2 + s3),)], "n long")


def incremental_triangles(
    old_total: int,
    old_edges: DataFrame,
    new_edges: DataFrame,
) -> DataFrame:
    """1-row (n_old, delta, n_new): update a global triangle count from a
    recrawl diff instead of re-enumerating every wedge.

    With G∩ = old ∩ new (canonical undirected), added = new − G∩ and
    removed = old − G∩:

        T(new) − T(old) = [triangles of NEW containing an added edge]
                        − [triangles of OLD containing a removed edge]

    (both sides share the G∩-only triangles, which cancel). Each bracket
    is the diff-anchored inclusion–exclusion count of
    :func:`_triangles_touching` — work follows the churn and the touched
    vertices' adjacency, never a full |E|-wedge enumeration. Exactness is
    pinned by pytest against a cold ``triangle_total`` on the new
    snapshot, overlapping-diff cases included.
    """
    und_old = _canonical_undirected(old_edges).persist()
    und_new = _canonical_undirected(new_edges).persist()
    added = und_new.join(und_old, ["a", "b"], "anti")
    removed = und_old.join(und_new, ["a", "b"], "anti")
    plus = _triangles_touching(added, und_new).collect()[0]["n"]
    minus = _triangles_touching(removed, und_old).collect()[0]["n"]
    und_old.unpersist()
    und_new.unpersist()
    delta = int(plus - minus)
    spark = old_edges.sparkSession
    return spark.createDataFrame(
        [(int(old_total), delta, int(old_total) + delta)],
        "n_old long, delta long, n_new long",
    )
