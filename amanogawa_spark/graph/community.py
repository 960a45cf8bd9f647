"""Modularity + Louvain community detection over the link graph.

Beyond-reference scope (the reference stops at its kNN ``to_graph``
construction, ``to_graph.cpp:88-117``): a curation pipeline over a web
link graph wants *communities* — template farms, mirror clusters, topic
hubs — and the standard tools are Newman modularity as the objective and
Louvain as the optimizer. Both are built Spark-first:

- :func:`modularity` is a pure DataFrame aggregate (two joins, two
  aggregates, one broadcastable totals row) — SQL-expressible, so it
  carries a DuckDB value oracle in the driver suite.
- :func:`louvain_move_round` is ONE synchronous local-move sweep with
  deterministic parity gating and smallest-id tie-breaks — the kernel is
  also SQL-expressible (unrolled), so the driver value-checks it.
- :func:`louvain` iterates move rounds and coarsens (phase 2) into
  super-vertex graphs, the full multi-level algorithm. The level loop is
  driver-side control flow over per-round DataFrame jobs, same shape as
  pagerank/LPA: per round ONE edge-sized shuffle (adjacency ⋈ assignment)
  plus two O(V) aggregates.

Scale notes (100 TB / 10^12 vertices): the adjacency is symmetrized once
per level and persisted; move rounds never shuffle it again (the join
key side is the O(V) assignment). Coarsening shrinks the graph
geometrically (typically 10-100× per level), so level-1+ costs are noise
next to level 0. Parallel-move oscillation (two adjacent vertices
swapping into each other's communities forever) is broken by parity
gating: only vertices with ``id % 2 == round % 2`` may move in a round —
deterministic, engine-portable (no hash-function parity), and the
standard fix from distributed Louvain literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.graph.components import _symmetrize


def _sym_weighted(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """Directed (src_id, dst_id[, w]) → symmetric simple adjacency (u, v, w).

    Each undirected edge {u, v} appears as BOTH (u,v,w) and (v,u,w);
    self-loops are dropped; parallel edges merge their weight (w=1 each
    when ``weight_col`` is None — the distinct-then-weight-1 convention
    matches ``_symmetrize``'s simple-graph contract).
    """
    if weight_col is None:
        return _symmetrize(edges).select("u", "v", F.lit(1.0).alias("w"))
    e = edges.filter(F.col("src_id") != F.col("dst_id"))
    fwd = e.select(
        F.col("src_id").alias("u"),
        F.col("dst_id").alias("v"),
        F.col(weight_col).cast("double").alias("w"),
    )
    rev = e.select(
        F.col("dst_id").alias("u"),
        F.col("src_id").alias("v"),
        F.col(weight_col).cast("double").alias("w"),
    )
    return fwd.unionAll(rev).groupBy("u", "v").agg(F.sum("w").alias("w"))


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    weight_col: str | None = None,
    per_community: bool = True,
) -> DataFrame:
    """Newman modularity of ``assignment`` (id, community) on the graph.

    Q = Σ_c [ e2_c / m2  −  (d_c / m2)² ]  over the symmetrized simple
    graph, where e2_c = twice the intra-community edge weight, d_c = the
    community's degree-weight sum, and m2 = total degree weight (2m).

    Returns per-community rows ``(community, intra2, deg_sum, q_contrib)``
    when ``per_community`` (sum ``q_contrib`` for Q), else a single row
    ``(modularity,)``. One edge-sized shuffle (the adjacency ⋈ assignment
    join), two O(V)/O(C) aggregates, and a broadcast 1-row totals join —
    no collect, no cartesian.
    """
    adj = _sym_weighted(edges, weight_col)
    a = assignment.select("id", "community")
    # degree weight per vertex → per community
    deg = adj.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("k"))
    deg_c = (
        deg.join(a, "id")
        .groupBy("community")
        .agg(F.sum("k").alias("deg_sum"))
    )
    # intra-community weight, counted from the symmetric matrix → already 2×
    intra2 = (
        adj.join(a.withColumnRenamed("id", "u").withColumnRenamed("community", "cu"), "u")
        .join(a.withColumnRenamed("id", "v").withColumnRenamed("community", "cv"), "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.sum("w").alias("intra2"))
    )
    totals = adj.agg(F.sum("w").alias("m2"))
    per_c = (
        deg_c.join(intra2, "community", "left")
        .select(
            "community",
            F.coalesce("intra2", F.lit(0.0)).alias("intra2"),
            "deg_sum",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "community",
            "intra2",
            "deg_sum",
            (
                F.col("intra2") / F.col("m2")
                - (F.col("deg_sum") / F.col("m2")) * (F.col("deg_sum") / F.col("m2"))
            ).alias("q_contrib"),
        )
    )
    if per_community:
        return per_c
    return per_c.agg(F.sum("q_contrib").alias("modularity"))


def louvain_move_round(
    assign: DataFrame,
    adj: DataFrame,
    deg: DataFrame,
    m2_df: DataFrame,
    round_idx: int,
) -> DataFrame:
    """One synchronous Louvain local-move sweep; returns the new (id, community).

    For each parity-active vertex u (``id % 2 == round_idx % 2``), the
    candidate score of joining neighboring community c (u ∉ c) is
    ``w_{u→c} − k_u · Σtot(c) / m2``; the stay score is
    ``w_{u→cu} − k_u · (Σtot(cu) − k_u) / m2`` (own mass excluded). The
    best candidate wins only on STRICT improvement, ties break to the
    smallest community id — fully deterministic, no RNG, no hash parity,
    so the sweep is engine-portable and the driver value-checks it
    against an unrolled DuckDB mirror.

    ``adj`` must be the symmetric simple adjacency (u, v, w) from
    :func:`_sym_weighted` (self-loop-free — coarse-level self-loops are
    carried in ``deg``, not here, because a self-loop can never change a
    move decision: it follows the vertex wherever it goes).
    """
    # vertex state (id, cu, k) — one join, reused by every branch below
    cur = assign.select("id", F.col("community").alias("cu")).join(deg, "id")
    # Σtot per community under the CURRENT assignment — O(V) agg
    tot = cur.groupBy(F.col("cu").alias("community")).agg(F.sum("k").alias("tot"))
    # w_{u→c}: the one edge-sized shuffle of the round
    wuc = (
        adj.join(
            assign.select(F.col("id").alias("v"), F.col("community").alias("c")), "v"
        )
        .groupBy(F.col("u").alias("id"), "c")
        .agg(F.sum("w").alias("wuc"))
    )
    # candidate rows (c may equal cu — that row IS the stay score when u has
    # neighbors in its own community); stayf=1 marks stay rows so the single
    # argmax below prefers staying on exact score ties — equivalent to the
    # documented strict-improvement rule
    cand = (
        wuc.join(tot.withColumnRenamed("community", "c"), "c")
        .join(cur, "id")
        .crossJoin(F.broadcast(m2_df))
        .select(
            "id",
            "c",
            "cu",
            F.when(
                F.col("c") == F.col("cu"),
                F.col("wuc") - F.col("k") * (F.col("tot") - F.col("k")) / F.col("m2"),
            )
            .otherwise(F.col("wuc") - F.col("k") * F.col("tot") / F.col("m2"))
            .alias("score"),
            F.when(F.col("c") == F.col("cu"), F.lit(1)).otherwise(F.lit(0)).alias(
                "stayf"
            ),
        )
    )
    # stay fallback for vertices with NO neighbor in their own community:
    # score = 0 − k·(Σtot(cu)−k)/m2. When a true stay row also exists it
    # dominates (its wuc ≥ 0 adds on the same base), so the max is unchanged.
    stay_fb = (
        cur.join(tot.withColumnRenamed("community", "cu"), "cu")
        .crossJoin(F.broadcast(m2_df))
        .select(
            "id",
            F.col("cu").alias("c"),
            "cu",
            (-F.col("k") * (F.col("tot") - F.col("k")) / F.col("m2")).alias("score"),
            F.lit(1).alias("stayf"),
        )
    )
    # ONE argmax over struct(score, stayf, −c): highest score wins; exact
    # ties prefer stay (stayf=1 > 0); candidate-candidate ties take the
    # smallest community id. cu rides along (constant per id) so no join
    # back is needed for inactive/staying vertices.
    active_parity = round_idx % 2
    return (
        cand.unionByName(stay_fb)
        .groupBy("id")
        .agg(
            F.max(
                F.struct(
                    F.col("score"),
                    F.col("stayf"),
                    (-F.col("c")).alias("neg"),
                    F.col("cu"),
                )
            ).alias("m")
        )
        .select(
            "id",
            F.when(
                (F.col("id") % 2 == F.lit(active_parity)) & (F.col("m.stayf") == 0),
                (-F.col("m.neg")).cast("long"),
            )
            .otherwise(F.col("m.cu"))
            .alias("community"),
        )
    )


def louvain(
    vertices: DataFrame,
    edges: DataFrame,
    max_levels: int = 3,
    rounds_per_level: int = 6,
    weight_col: str | None = None,
    adaptive: bool = False,
) -> DataFrame:
    """Multi-level Louvain; returns (id, community) for every input vertex.

    Level loop: symmetrize+persist the (possibly coarse) adjacency, run
    ``rounds_per_level`` parity-gated move sweeps
    (:func:`louvain_move_round`), stop the level early when a sweep moves
    nothing (one O(V) anti-join count per round — the same driver-scalar
    convergence pattern as pagerank), then coarsen: communities become
    super-vertices, inter-community weights merge, intra weight folds
    into the super-vertex degree (carried via ``deg``, not a self-loop
    row — see :func:`louvain_move_round`). The vertex→community mapping
    composes across levels so the result is in ORIGINAL vertex ids.

    Community ids are the minimum member vertex id at every level, so the
    output is deterministic and repartition-invariant.

    ``adaptive=False`` (default) scopes AQE off for the loop — the move
    rounds are pinned PageRank-shaped plans where AQE's per-exchange
    stage barriers are pure latency (see ``iter_conf.py`` for the
    measured basis); pass True to opt back in for residual-skew graphs.
    """
    from amanogawa_spark.graph.iter_conf import iteration_conf

    spark = vertices.sparkSession
    with iteration_conf(spark, disable_aqe=not adaptive):
        return _louvain_loop(
            vertices, edges, max_levels, rounds_per_level, weight_col
        )


def _louvain_loop(
    vertices: DataFrame,
    edges: DataFrame,
    max_levels: int,
    rounds_per_level: int,
    weight_col: str | None,
) -> DataFrame:
    mapping = vertices.select("id", F.col("id").alias("community"))
    cur_edges = edges
    cur_weight = weight_col
    extra_deg = None  # (id, k_self) — coarse-level folded intra weight
    for level in range(max_levels):
        adj = _sym_weighted(cur_edges, cur_weight).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        deg = adj.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("k"))
        if extra_deg is not None:
            deg = (
                deg.join(extra_deg, "id", "outer")
                .select(
                    "id",
                    (
                        F.coalesce("k", F.lit(0.0))
                        + F.coalesce("k_self", F.lit(0.0))
                    ).alias("k"),
                )
            )
        deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
        m2_df = deg.agg(F.sum("k").alias("m2"))
        assign = deg.select("id", F.col("id").alias("community")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        pending = [assign]
        for rnd in range(rounds_per_level):
            # eager localCheckpoint, not bare persist: a move round references
            # the previous assignment ~5× (wuc/cur/tot/stay/best), so without
            # lineage truncation the logical plan grows 5^rounds — the
            # checkpoint keeps every round's plan O(1) and caches the frame.
            nxt = louvain_move_round(assign, adj, deg, m2_df, rnd).localCheckpoint(
                eager=True
            )
            moved = (
                nxt.join(assign.withColumnRenamed("community", "prev"), "id")
                .filter(F.col("community") != F.col("prev"))
                .count()
            )
            pending.append(nxt)
            assign = nxt
            if moved == 0:
                break
        # canonicalize community ids to min member id (deterministic)
        canon = assign.groupBy("community").agg(F.min("id").alias("cmin"))
        assign = assign.join(canon, "community").select(
            "id", F.col("cmin").alias("community")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        pending.append(assign)
        # one driver action for both convergence scalars
        stats = assign.agg(
            F.count("*").alias("nv"), F.countDistinct("community").alias("nc")
        ).collect()[0]
        n_vert, n_comm = stats.nv, stats.nc
        # compose into original-id mapping. LEFT join: isolated vertices
        # never enter a level's assign (it is keyed off degree rows) and
        # must keep their singleton community rather than vanish.
        new_mapping = (
            mapping.alias("m")
            .join(
                assign.select(
                    F.col("id").alias("_cid"), F.col("community").alias("_new")
                ),
                F.col("m.community") == F.col("_cid"),
                "left",
            )
            .select(
                F.col("m.id").alias("id"),
                F.coalesce(F.col("_new"), F.col("m.community")).alias("community"),
            )
            .localCheckpoint(eager=True)
        )
        for p in pending:
            p.unpersist()
        adj.unpersist()
        deg.unpersist()
        mapping = new_mapping
        if n_comm == n_vert or level == max_levels - 1:
            break
        # phase 2: coarsen — communities become super-vertices. Rebuilding
        # from the ORIGINAL edges under the composed mapping (rather than
        # contracting the previous coarse graph) keeps every level a
        # two-join aggregate over the persisted base adjacency and avoids
        # chaining lineage through L coarse frames.
        sym0 = _sym_weighted(edges, weight_col)
        both = (
            sym0.join(
                mapping.select(F.col("id").alias("u"), F.col("community").alias("c1")),
                "u",
            )
            .join(
                mapping.select(F.col("id").alias("v"), F.col("community").alias("c2")),
                "v",
            )
        )
        inter = (
            both.filter(F.col("c1") != F.col("c2"))
            .groupBy(F.col("c1").alias("src_id"), F.col("c2").alias("dst_id"))
            .agg((F.sum("w") / 2).alias("w"))
        )
        # (c1,c2) and (c2,c1) both present with w/2 each → _sym_weighted
        # re-merges them to the full undirected weight
        cur_edges = inter
        cur_weight = "w"
        extra_deg = (
            both.filter(F.col("c1") == F.col("c2"))
            .groupBy(F.col("c1").alias("id"))
            .agg(F.sum("w").alias("k_self"))
            .localCheckpoint(eager=True)
        )
    return mapping


def refine_communities(
    assignment: DataFrame,
    edges: DataFrame,
    max_rounds: int = 50,
) -> DataFrame:
    """Leiden-style refinement: guarantee every community is internally
    CONNECTED by splitting each community into its connected components
    over the intra-community edge subgraph — the core fix Traag et al.
    (2019, "From Louvain to Leiden") make to Louvain, whose move phase
    can leave a community's internal subgraph disconnected (a vertex
    bridging two parts moves away and strands them).

    ``assignment``: (id, community); ``edges``: directed (src_id, dst_id).
    Returns (id, community) where community = the minimum member id of
    the connected part — deterministic, repartition-invariant, and a
    strict refinement of the input partition (parts only split, never
    merge: intra edges exist only inside one input community, so no
    component can span two).

    Scale shape: one broadcast-free double join to keep intra edges
    (both sides hash-partition on the vertex id — the same key CC
    shuffles on), then small-star/large-star CC, whose round count is
    logarithmic in the LARGEST PART's diameter, not the graph's. No
    per-community driver loop: all communities refine in one CC run.
    """
    a = assignment.select("id", "community")
    src_c = a.select(
        F.col("id").alias("src_id"), F.col("community").alias("_sc")
    )
    dst_c = a.select(
        F.col("id").alias("dst_id"), F.col("community").alias("_dc")
    )
    intra = (
        edges.select("src_id", "dst_id")
        .join(src_c, "src_id")
        .join(dst_c, "dst_id")
        .filter(F.col("_sc") == F.col("_dc"))
        .select("src_id", "dst_id")
    )
    from amanogawa_spark.graph.components import connected_components

    return connected_components(
        a.select("id"), intra, max_rounds=max_rounds
    ).select("id", F.col("component").alias("community"))


def refinement_summary(
    before: DataFrame, after: DataFrame
) -> DataFrame:
    """One row (communities_before, communities_after, communities_split,
    vertices_moved) quantifying what refinement changed. A Louvain run
    whose every community was already connected reports 0 splits."""
    b = before.select("id", F.col("community").alias("cb"))
    a = after.select("id", F.col("community").alias("ca"))
    j = b.join(a, "id")
    per = j.groupBy("cb").agg(
        F.countDistinct("ca").alias("parts"),
        F.sum(F.when(F.col("cb") != F.col("ca"), 1).otherwise(0)).alias("mv"),
    )
    return per.agg(
        F.count("*").alias("communities_before"),
        F.sum("parts").cast("long").alias("communities_after"),
        F.sum(F.when(F.col("parts") > 1, 1).otherwise(0))
        .cast("long")
        .alias("communities_split"),
        F.sum("mv").cast("long").alias("vertices_moved"),
    )
