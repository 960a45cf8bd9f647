"""Balanced graph partitioning — community-driven by default, Spinner as
the refinement kernel.

The north rule demands partitioning/shuffle handled EXPLICITLY; this
module computes the partition map itself: assign every vertex to one of
``k`` partitions so that (a) edge cut is low — adjacent vertices co-locate,
so the per-iteration shuffles of PageRank/CC/LPA move less data — and
(b) partitions stay balanced within a slack factor, so no executor owns a
hub pile.

WHICH PARTITIONER: use :func:`community_partition` on web-shaped graphs —
host-level link locality means the natural communities ARE the good
partition, and on the locality bench corpus it cuts 0.171 at perfect
balance where flat Spinner from a random init gets stuck at 0.665
(BENCH_r04). Flat :func:`spinner_partition` remains exported as the
REFINEMENT kernel (``refine_rounds`` in both ``community_partition`` and
``multilevel_partition`` call its round function to polish boundaries)
and for locality-free graphs where no community structure exists.

The Spinner kernel is the deterministic variant of Spinner (Martella
et al. 2017): label propagation where a vertex scores each candidate
partition by its neighbor count there, discounted by the partition's
fullness, and migrates only on strict improvement.

Determinism: initialization is an md5 hash of the vertex id (engine-
portable — the one-round kernel carries a DuckDB value oracle); the
oscillation that randomized Spinner breaks with move probabilities is
broken here with a round-keyed md5 coin (half the would-be movers act
each round, a different half every round), and ties break toward the
smaller partition id.

Per round: ONE edge-sized shuffle (adjacency ⋈ labels, map-side combined
into (vertex, partition) counts) + an O(k)-row load aggregate broadcast
into the scoring join. Convergence = zero movers (one O(1) driver scalar
per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.graph.components import _symmetrize


def _init_pid(k: int) -> F.Column:
    """Deterministic engine-portable initial partition: md5(id) mod k."""
    return (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % k
    ).cast("int")


def spinner_round(
    labels: DataFrame, adj: DataFrame, k: int, round_idx: int,
    capacity: float,
) -> DataFrame:
    """One synchronous Spinner round → new (id, pid).

    ``labels``: (id, pid); ``adj``: symmetric (u, v) pairs, optionally with
    a ``weight`` column (coarse multigraphs from ``contract_matching``
    carry summed multiplicities — threading the weight through the
    neighbour score instead of exploding ``sequence(1, weight)`` into
    repeated rows keeps a contracted hub edge O(1) rows, not O(weight)).
    Movers are the round's coin-active vertices; each scores partition p
    as ``w_p · (1 − load_p / capacity)`` over its neighbourhood (w = edge
    count when unweighted) and takes the argmax (score desc, pid asc) iff
    STRICTLY better than its current partition's score. Vertices with no
    neighbours never move.
    """
    loads = labels.groupBy("pid").agg(F.count("*").cast("double").alias("load"))
    nbr_w = (
        F.sum(F.col("weight").cast("double"))
        if "weight" in adj.columns
        else F.count("*").cast("double")
    )
    nbr = (
        adj.join(labels.select(F.col("id").alias("u"), F.col("pid")), "u")
        .groupBy(F.col("v").alias("id"), "pid")
        .agg(nbr_w.alias("cnt"))
    )
    scored = nbr.join(F.broadcast(loads), "pid").select(
        "id", "pid", (F.col("cnt") * (1.0 - F.col("load") / capacity)).alias("score")
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("pid"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("pid").alias("best_pid"), F.col("score").alias("best_score"))
    )
    cur = scored.select("id", F.col("pid").alias("cur_pid"), F.col("score").alias("cur_score"))
    cur_score = labels.join(
        cur, (labels["id"] == cur["id"]) & (labels["pid"] == cur["cur_pid"]), "left"
    ).select(
        labels["id"], "pid", F.coalesce("cur_score", F.lit(0.0)).alias("cur_score")
    )
    # deterministic analogue of Spinner's move probability: a per-round
    # md5 coin gates HALF the would-be movers, a different half each round
    # (engine-portable for the oracle). Pure parity alone lets symmetric
    # halves swap in lockstep forever (measured: period-4 oscillation on
    # two 8-cliques); the round-keyed coin desynchronizes them.
    active = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("id").cast("string"),
                        F.lit(str(round_idx)),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    planned = (
        cur_score.join(best, "id", "left")
        .filter(
            active
            & F.col("best_pid").isNotNull()
            & (F.col("best_pid") != F.col("pid"))
            & (F.col("best_score") > F.col("cur_score"))
        )
        .select("id", "pid", "best_pid", "best_score")
    )
    # admission quota: a synchronous round must not overshoot — every mover
    # scores against the PRE-round loads, so unbounded admission piles
    # whole neighbourhoods into one partition in a single round (measured:
    # two 8-cliques both collapsing into pid 1). Rank planned movers per
    # target and admit only the room = capacity − load + planned
    # departures (without the departure credit a full-but-shedding
    # partition deadlocks — measured: zero moves ever on an 8/8 split with
    # capacity 8.4). A blocked departure stays put, so a round can
    # transiently overshoot by at most that partition's blocked departures
    # — the same bounded slack randomized Spinner tolerates. The
    # per-target window is bounded by movers-per-partition; at extreme
    # scale swap the exact rank for a hash-priority threshold.
    departures = planned.groupBy(F.col("pid").alias("best_pid")).agg(
        F.count("*").cast("double").alias("_dep")
    )
    headroom = (
        loads.select(F.col("pid").alias("best_pid"), "load")
        .join(departures, "best_pid", "left")
        .select(
            "best_pid",
            F.greatest(
                F.lit(0.0),
                F.lit(capacity) - F.col("load") + F.coalesce("_dep", F.lit(0.0)),
            ).alias("_room"),
        )
    )
    wq = Window.partitionBy("best_pid").orderBy(F.desc("best_score"), F.asc("id"))
    admitted = (
        planned.join(F.broadcast(headroom), "best_pid", "left")
        .withColumn("_q", F.row_number().over(wq))
        .filter(F.col("_q") <= F.coalesce(F.col("_room"), F.lit(capacity)))
        .select("id", F.col("best_pid").alias("new_pid"))
    )
    return labels.join(admitted, "id", "left").select(
        "id", F.coalesce("new_pid", "pid").alias("pid")
    )


def _symmetrize_weighted(edges: DataFrame) -> DataFrame:
    """Directed (src_id, dst_id, weight) → undirected (u, v, weight) with
    parallel-edge weights summed — the weighted analogue of
    components._symmetrize (which dedups pairs and drops multiplicity)."""
    w = F.col("weight").cast("double").alias("weight")
    fwd = edges.select(F.col("src_id").alias("u"), F.col("dst_id").alias("v"), w)
    rev = edges.select(F.col("dst_id").alias("u"), F.col("src_id").alias("v"), w)
    return (
        fwd.unionAll(rev)
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("weight").alias("weight"))
    )


def spinner_partition(
    vertices: DataFrame,
    edges: DataFrame,
    k: int = 8,
    max_rounds: int = 20,
    balance_slack: float = 1.05,
    stop_moves_frac: float = 0.0,
    work_dir: str | None = None,
    weighted: bool = False,
) -> DataFrame:
    """(id, pid): balanced low-cut partition map — the flat-Spinner
    REFINEMENT kernel. Prefer :func:`community_partition` as the default
    on web-shaped graphs: from a random init flat Spinner gets stuck far
    from the community structure (cut 0.665 vs 0.171 on the locality
    bench corpus, BENCH_r04); it earns its keep polishing boundaries via
    ``refine_rounds`` or on locality-free graphs.

    Stops when a round moves ≤ ``stop_moves_frac · n`` vertices (the coin
    gate keeps nudging a handful of borderline vertices forever on small
    graphs, so exact zero may never arrive) or after ``max_rounds``.
    Capacity = ceil(n/k · slack).

    Lineage is truncated by writing the O(V)-row label table to parquet
    each round (``work_dir``, default a temp dir) — NOT with chained
    ``localCheckpoint``: measured on this Spark build, a loop that feeds
    each round's eager localCheckpoint into the next starts recomputing
    ~4× more work per round from about round 9 (1.3 s → 150 s by round
    12 on a 16-vertex graph; flat ~3 s/round with parquet truncation,
    identical results — unpersisting predecessors does not help). The
    parquet round-trip also makes any round a durable resume point, the
    same pattern as the PageRank/SCC superjobs' CheckpointManager.
    """
    import tempfile

    adj = (
        _symmetrize_weighted(edges) if weighted else _symmetrize(edges)
    ).localCheckpoint(eager=True)
    labels = (
        vertices.select("id").distinct().select("id", _init_pid(k).alias("pid"))
    ).localCheckpoint(eager=True)
    n = labels.count()
    capacity = float(-(-n // k)) * balance_slack
    spark = vertices.sparkSession
    wd = work_dir or tempfile.mkdtemp(prefix="spinner_")
    for r in range(1, max_rounds + 1):
        path = f"{wd}/labels_r{r}"
        spinner_round(labels, adj, k, r, capacity).write.mode("overwrite").parquet(path)
        nxt = spark.read.parquet(path)
        moved = (
            nxt.alias("a")
            .join(labels.alias("b"), "id")
            .filter(F.col("a.pid") != F.col("b.pid"))
            .count()
        )
        labels = nxt
        if moved <= stop_moves_frac * n:
            break
    return labels


def edge_cut(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row: (n_edges, n_cut, cut_frac_r) of the partition map over the
    directed edge table — the quality metric a partitioning job logs."""
    l_src = labels.select(F.col("id").alias("src_id"), F.col("pid").alias("p_src"))
    l_dst = labels.select(F.col("id").alias("dst_id"), F.col("pid").alias("p_dst"))
    e = edges.join(l_src, "src_id").join(l_dst, "dst_id")
    return e.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.when(F.col("p_src") != F.col("p_dst"), 1).otherwise(0))
        .cast("long")
        .alias("n_cut"),
    ).select(
        "n_edges",
        "n_cut",
        F.round(F.col("n_cut") / F.greatest(F.col("n_edges"), F.lit(1)), 8).alias(
            "cut_frac_r"
        ),
    )


def multilevel_partition(
    vertices: DataFrame,
    edges: DataFrame,
    k: int = 8,
    levels: int = 2,
    coarse_rounds: int = 12,
    refine_rounds: int = 3,
    balance_slack: float = 1.05,
    stop_moves_frac: float = 0.02,
    work_dir: str | None = None,
) -> DataFrame:
    """(id, pid): METIS-style multilevel partitioning.

    Coarsen ``levels`` times by maximal matching + contraction (each level
    roughly halves the vertices), run :func:`spinner_partition` on the
    small graph where global structure is visible, then project labels
    back through the matchings and polish each level with a few
    quota-gated refinement rounds. The standard result carries over:
    decisions made on the coarse graph capture cluster structure that
    flat label propagation on the fine graph finds slowly or never.

    Every stage reuses audited kernels: matching (graph/matching.py),
    contraction (weight-summed coarse multigraph — weights enter the
    refinement scores through edge multiplicity), spinner rounds
    (admission quotas, md5 coin). Projection is one join through the
    matching mapping per level.
    """
    import tempfile

    from amanogawa_spark.graph.matching import contract_matching, maximal_matching

    wd = work_dir or tempfile.mkdtemp(prefix="mlpart_")
    # ---- coarsening phase: remember each level's matching mapping
    cur_edges = edges.select("src_id", "dst_id").localCheckpoint(eager=True)
    mappings: list[DataFrame] = []
    for lvl in range(levels):
        m = maximal_matching(cur_edges)
        mapping = (
            m.select(F.col("u").alias("id"), F.least("u", "v").alias("super"))
            .unionAll(m.select(F.col("v").alias("id"), F.least("u", "v").alias("super")))
            .localCheckpoint(eager=True)
        )
        mappings.append(mapping)
        # the contracted multigraph carries multiplicities in the `weight`
        # column, threaded straight into the spinner neighbour score — a
        # contracted hub edge stays ONE row regardless of its weight
        # (the old sequence(1, weight) explode re-materialized O(weight)
        # rows per coarse edge, undoing the coarsening on skewed graphs)
        cur_edges = contract_matching(cur_edges, m).localCheckpoint(eager=True)
    coarse_verts = (
        cur_edges.select(F.col("src_id").alias("id"))
        .unionAll(cur_edges.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    labels = spinner_partition(
        coarse_verts,
        cur_edges,
        k=k,
        max_rounds=coarse_rounds,
        balance_slack=balance_slack,
        stop_moves_frac=stop_moves_frac,
        work_dir=f"{wd}/coarse",
        weighted="weight" in cur_edges.columns,
    )
    # ---- uncoarsening: project through each matching, then refine
    all_vertices = vertices.select("id").distinct()
    level_edges = edges.select("src_id", "dst_id")
    for lvl in range(levels - 1, -1, -1):
        mapping = mappings[lvl]
        projected = (
            mapping.join(
                labels.select(F.col("id").alias("super"), "pid"), "super"
            ).select("id", "pid")
        )
        # vertices that were never matched at this level keep their label
        labels = projected.unionByName(
            labels.join(mapping.select("super").distinct(),
                        labels["id"] == F.col("super"), "left_anti")
            .select("id", "pid")
        ).localCheckpoint(eager=True)
    # any isolated vertices the coarse graph never saw: deterministic init
    labels = labels.unionByName(
        all_vertices.join(labels.select("id"), "id", "left_anti")
        .select("id", _init_pid(k).alias("pid"))
    ).localCheckpoint(eager=True)
    # refinement on the full graph
    adj = _symmetrize(level_edges).localCheckpoint(eager=True)
    n = all_vertices.count()
    capacity = float(-(-n // k)) * balance_slack
    spark = vertices.sparkSession
    for r in range(1, refine_rounds + 1):
        path = f"{wd}/refine_r{r}"
        spinner_round(labels, adj, k, r, capacity).write.mode("overwrite").parquet(path)
        labels = spark.read.parquet(path)
    return labels


def community_partition(
    vertices: DataFrame,
    edges: DataFrame,
    k: int = 8,
    balance_slack: float = 1.05,
    lpa_rounds: int = 5,
    refine_rounds: int = 0,
    work_dir: str | None = None,
    head_row_budget: int = 100_000,
) -> DataFrame:
    """(id, pid): community-driven balanced partitioning — find the
    graph's natural communities with synchronous LPA, then FIRST-FIT-
    DECREASING bin-pack the community SIZE TABLE into k bins on the
    driver.

    Why this shape for web graphs: host-level link locality means the
    community structure IS the good partition; LPA recovers it in a few
    edge-shuffle rounds, and balancing then only needs the |communities|-
    row aggregate — the corpus itself never funnels anywhere. Communities
    larger than one bin's capacity are split by member hash (a hub
    community must not blow the balance), and ``refine_rounds`` optional
    Spinner sweeps polish the boundary afterwards.

    Driver footprint is HARD-BOUNDED by ``head_row_budget``: only the
    ``head_row_budget`` LARGEST communities are collected (a
    TakeOrdered, never a full collect) and exactly packed; every smaller
    community — the tail, at 10^12 vertices potentially ~10^8 host
    communities — is assigned a bin by a deterministic label hash
    entirely in-plan, whole-community-at-a-time so locality is kept. The
    head's FFD pre-loads each bin with the tail's expected uniform share
    (tail_mass/k), so exact packing accounts for the hashed mass. Since
    balance only needs exactness for communities big enough to matter
    (> n·slack/k would overflow a bin; anything tiny hashes uniformly),
    the default 100k-row head is far more than the O(k/slack) communities
    that can individually threaten balance.
    """
    from amanogawa_spark.graph.lpa import label_propagation

    labels = label_propagation(
        vertices.select("id"), edges, max_rounds=lpa_rounds
    )
    sizes_df = labels.groupBy("label").agg(F.count("*").alias("cnt"))
    sizes_df = sizes_df.localCheckpoint(eager=True)  # reused: head + scalar
    n = sizes_df.agg(F.sum("cnt")).first()[0] or 0
    if n == 0:
        return vertices.select("id", F.lit(0).cast("int").alias("pid")).limit(0)
    # bounded collect: TakeOrderedAndProject of the head, count desc /
    # label asc — identical order to the old full sort for any corpus
    # whose community count fits the budget
    head_rows = (
        sizes_df.orderBy(F.desc("cnt"), F.asc("label"))
        .limit(head_row_budget)
        .collect()
    )
    sizes = [(int(r["cnt"]), int(r["label"])) for r in head_rows]
    head_mass = sum(c for c, _ in sizes)
    tail_mass = int(n) - head_mass
    capacity = (-(-int(n) // k)) * balance_slack
    # each bin starts pre-loaded with the tail's expected hash share so
    # the exact head packing accounts for the in-plan tail assignment
    bins = [tail_mass / float(k)] * k
    assign: list[tuple[int, int]] = []  # (label, pid); pid -1 = split by hash
    for cnt, lab in sizes:
        if cnt > capacity:
            assign.append((lab, -1))
            for b in range(k):
                bins[b] += cnt / k
            continue
        # first-fit-decreasing: smallest current load that still fits,
        # deterministic tie-break on bin index
        order = sorted(range(k), key=lambda b: (bins[b], b))
        tgt = next((b for b in order if bins[b] + cnt <= capacity), order[0])
        bins[tgt] += cnt
        assign.append((lab, tgt))
    spark = vertices.sparkSession
    amap = F.broadcast(
        spark.createDataFrame(assign, "label long, pid int")
    )
    # head labels join their packed pid; tail labels (left join miss) get
    # a whole-community hash bin — deterministic, no driver row involved
    tail_pid = F.pmod(
        F.xxhash64(F.col("label"), F.lit("cpart_tail")), F.lit(k)
    ).cast("int")
    out = labels.join(amap, "label", "left").select(
        "id",
        F.when(F.col("pid").isNull(), tail_pid)
        .when(F.col("pid") >= 0, F.col("pid"))
        .otherwise(_init_pid(k))
        .cast("int")
        .alias("pid"),
    )
    if refine_rounds > 0:
        import tempfile

        wd = work_dir or tempfile.mkdtemp(prefix="cpart_")
        adj = _symmetrize(edges).localCheckpoint(eager=True)
        out = out.localCheckpoint(eager=True)
        for r in range(1, refine_rounds + 1):
            path = f"{wd}/refine_r{r}"
            spinner_round(out, adj, k, r, capacity).write.mode(
                "overwrite"
            ).parquet(path)
            out = spark.read.parquet(path)
    return out
