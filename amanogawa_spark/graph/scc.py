"""Strongly connected components — directed web-graph structure.

The web link graph is DIRECTED; its condensation (bowtie: giant SCC +
IN/OUT/tendrils) is the classic Common-Crawl structural analysis, and
dangling-free PageRank variants, spam-farm detection, and crawl-frontier
scheduling all consume SCC ids. The undirected components in
``graph/components.py`` cannot see this structure.

Algorithm: iterative forward-backward min-label peeling (the distributed
"coloring" family — Orzan '04 / FW-BW Slota et al., re-expressed as
DataFrame joins):

  repeat until no active vertices:
    f(v) = min id that REACHES v      (min-label propagation along edges)
    b(v) = min id v REACHES           (same, along reversed edges)
    f(v) == b(v) == m  ⟹  m→v and v→m  ⟹  v ∈ SCC(m): extract, peel.

Each propagation MUST run to its fixpoint before extracting: at the
fixpoint every member of an SCC carries the same (f, b) pair, so the
extracted classes are complete SCCs — peeling them cannot split a
surviving component. (Under a bounded propagation, f(v)=b(v)=m still
implies v ∈ SCC(m), but only a PARTIAL subset of SCC(m) may qualify;
removing that subset disconnects the remainder and corrupts later
rounds — measured, not hypothetical. Hence no round-bound knob.) Each
outer round removes at least the SCC of the minimum active vertex (its
f and b are provably itself), so the peel terminates.

Scale shape per inner round: one join shuffling the O(V) label side
against the edge table (hash-partitioned once per outer round) + a
map-side-combined min aggregate; the convergence signal is a single
1-row sum (labels only decrease, so an unchanged sum means a fixpoint —
one cheap action, no exceptAll scan). Lineage truncated every round;
per-round caches released as soon as their successor materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _min_label_fixpoint(
    verts: DataFrame,
    edges: DataFrame,
    src: str,
    dst: str,
) -> DataFrame:
    """(id, lab): lab = min id with a directed path to v along src→dst.

    Labels start at the vertex id and only decrease. The convergence
    signal is the COUNT of labels that changed this round (one 1-row
    action over the same frame the round materializes anyway) — NOT a
    sum of label values: with ``xxhash64`` vertex ids (the web-scale id
    path) label values sit near ±2^63 and an ANSI-mode sum overflows
    long on the first aggregate; a double-typed sum silently loses the
    low bits and can declare a false fixpoint. Measured, not
    hypothetical: the 200k-page hash-id probe overflowed immediately.
    """
    labels = verts.select("id", F.col("id").alias("lab")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    while True:
        incoming = (
            edges.join(
                labels.select(F.col("id").alias(src), "lab").hint("shuffle_hash"),
                src,
            )
            .groupBy(F.col(dst).alias("id"))
            .agg(F.min("lab").alias("in_lab"))
        )
        stepped = (
            labels.select("id", F.col("lab").alias("_old"))
            .join(incoming.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                "_old",
                F.least("_old", F.coalesce("in_lab", "_old")).alias("lab"),
            )
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_changed = (
            stepped.agg(
                F.sum((F.col("lab") != F.col("_old")).cast("long"))
            ).collect()[0][0]
            or 0
        )
        labels.unpersist()
        # keep the PERSISTED handle itself (a .select() projection would
        # make the caller's unpersist a cache-manager no-op); the extra
        # _old column is dropped by every downstream projection
        labels = stepped
        if n_changed == 0:
            break
    return labels


def _trim_trivial(
    active: DataFrame, e_act: DataFrame, max_trim: int
) -> tuple[DataFrame, DataFrame, list[DataFrame], list[DataFrame]]:
    """FW-BW-**Trim**: peel vertices with no in- or no out-edge in the
    active subgraph — each is its own singleton SCC — before paying for
    the double min-label fixpoint.

    On bowtie-shaped web graphs the IN/OUT tendrils and disconnected
    fringe are a large share of vertices; removing them shrinks every
    subsequent propagation round's join input. Each trim round costs two
    distinct-projections + two semi-joins + one count — about one
    fixpoint propagation round — and is capped at ``max_trim`` (a long
    chain would otherwise trim one layer per round; past the cap the
    fixpoint handles what's left).

    Returns (core_active, core_edges, singleton_parts, handles_to_unpersist).
    """
    singles: list[DataFrame] = []
    handles: list[DataFrame] = []
    cur_v, cur_e = active, e_act
    if max_trim <= 0:
        return cur_v, cur_e, singles, handles
    n_cur = active.count()
    for _ in range(max_trim):
        has_out = cur_e.select(F.col("src_id").alias("id")).distinct()
        has_in = cur_e.select(F.col("dst_id").alias("id")).distinct()
        core = (
            cur_v.join(has_out, "id", "left_semi")
            .join(has_in, "id", "left_semi")
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_core = core.count()
        if n_core == n_cur:
            core.unpersist()
            break
        trimmed = (
            cur_v.join(core, "id", "left_anti")
            .select("id", F.col("id").alias("scc"))
            .localCheckpoint(eager=True)
        )
        singles.append(trimmed)
        new_e = (
            cur_e.join(core.select(F.col("id").alias("src_id")), "src_id", "left_semi")
            .join(core.select(F.col("id").alias("dst_id")), "dst_id", "left_semi")
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if cur_v is not active:
            cur_v.unpersist()
        if cur_e is not e_act:
            cur_e.unpersist()
        cur_v, cur_e, n_cur = core, new_e, n_core
        if n_core == 0:
            break
    if cur_v is not active:
        handles.append(cur_v)
    if cur_e is not e_act:
        handles.append(cur_e)
    return cur_v, cur_e, singles, handles


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_outer: int = 100,
    max_trim: int = 5,
    trim_min_vertices: int = 10_000,
    checkpoint=None,
) -> DataFrame:
    """(id, scc) — scc is the minimum vertex id of each strong component.

    Exact. Every propagation runs to its fixpoint (required for
    correctness — see the module docstring); on bowtie-shaped web graphs
    the giant SCC and most of the condensation peel off in the first
    outer round.

    Contract when ``max_outer`` is exhausted before the peel completes:
    unassigned vertices are returned with ``scc IS NULL`` and a WARNING
    is logged. Callers that require a total assignment must check for
    NULLs (or raise ``max_outer``).

    ``checkpoint``: optional
    :class:`~amanogawa_spark.checkpoint.CheckpointManager` — after each
    outer round the full peel state is snapshotted as one frame
    (``(id, scc)`` with NULL scc = still active), so a killed superjob
    resumes at the last completed round (north rule: every iteration
    resumable, with per-partition lineage manifests + metrics journal).
    """
    active = (
        vertices.select("id").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_all = edges.select("src_id", "dst_id").filter(
        F.col("src_id") != F.col("dst_id")
    )
    done_parts: list[DataFrame] = []
    start_round = 0
    if checkpoint is not None:
        last = checkpoint.latest_iteration()
        if last is not None:
            state = checkpoint.load(last)
            done_parts = [state.filter(F.col("scc").isNotNull())]
            resumed = (
                state.filter(F.col("scc").isNull())
                .select("id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            active.unpersist()
            active = resumed
            start_round = last
    for rnd in range(start_round + 1, max_outer + 1):
        n_active = active.count()
        if n_active == 0:
            break
        e_act = (
            e_all.join(active.select(F.col("id").alias("src_id")), "src_id", "left_semi")
            .join(active.select(F.col("id").alias("dst_id")), "dst_id", "left_semi")
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # size-gate the trim: each trim round costs a handful of fixed-cost
        # jobs (two distincts + semi-joins + a count), which on a big bowtie
        # removes ~30% of vertices before the double fixpoint (measured 2.8×
        # at 200k pages, tools/scc_probe.py) but on a small graph is pure
        # barrier overhead (measured 5.6 s → 12.2 s on the sf0.1 bench graph)
        trim = max_trim if n_active >= trim_min_vertices else 0
        core_v, core_e, singles, trim_handles = _trim_trivial(
            active, e_act, trim
        )
        fwd = _min_label_fixpoint(core_v, core_e, "src_id", "dst_id")
        bwd = _min_label_fixpoint(core_v, core_e, "dst_id", "src_id")
        done = (
            fwd.join(bwd.select("id", F.col("lab").alias("blab")), "id")
            .filter(F.col("lab") == F.col("blab"))
            .select("id", F.col("lab").alias("scc"))
            .localCheckpoint(eager=True)  # materialize BEFORE parents unpersist
        )
        # this round's full assignment = trim singletons + fixpoint peel
        for s in singles:
            done = done.unionAll(s)
        done_parts.append(done)
        nxt_active = (
            active.join(done, "id", "left_anti")
            .localCheckpoint(eager=True)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if checkpoint is not None:
            state = nxt_active.select(
                "id", F.lit(None).cast("long").alias("scc")
            )
            for part in done_parts:
                state = state.unionAll(part)
            saved = checkpoint.save(state, rnd)
            # re-anchor the accumulator on the durable snapshot so later
            # rounds (and the final union) read parquet, not long lineage
            done_parts = [saved.filter(F.col("scc").isNotNull())]
            n_extracted = done_parts[0].count()
            checkpoint.log_metrics(rnd, n_done=n_extracted)
        fwd.unpersist()
        bwd.unpersist()
        for h in trim_handles:
            h.unpersist()
        e_act.unpersist()
        active.unpersist()
        active = nxt_active
    remaining = active  # empty unless max_outer was hit
    n_remaining = remaining.count()
    if n_remaining > 0:
        # incomplete peel: surface it loudly — NULL scc rows silently
        # misbehave in downstream joins/groupBys (see docstring contract)
        import logging

        logging.getLogger(__name__).warning(
            "strongly_connected_components: max_outer=%d exhausted with %d "
            "vertices unassigned; their scc is NULL in the result",
            max_outer,
            n_remaining,
        )
    out = done_parts[0] if done_parts else remaining.select(
        "id", F.lit(None).cast("long").alias("scc")
    )
    for part in done_parts[1:]:
        out = out.unionAll(part)
    if done_parts and n_remaining > 0:
        out = out.unionAll(
            remaining.select("id", F.lit(None).cast("long").alias("scc"))
        )
    active.unpersist()
    return out
