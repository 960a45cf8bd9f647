"""Redirect-chain resolution — pointer doubling over a functional graph.

A crawl emits a redirect map (src → dst): HTTP 301/302/308, canonical
link elements, URL-normalization aliases.  Before graph construction
every edge endpoint must be rewritten to its TERMINAL target, otherwise
rank mass parks on hop-through URLs and near-duplicate vertices split
the link graph (the reference's graph builder assumes this happened
upstream; amanogawa to_graph consumes already-canonical URLs).

Each source has exactly ONE outgoing pointer (dedup picks the
lexicographically-smallest dst per src — deterministic under any input
partitioning).  Resolution is pointer doubling / path halving (the
Wyllie / shortcutting technique that also powers the star CC operator):
each round rewrites  v → p(v)  into  v → p(p(v)) , so chain length
halves and ``ceil(log2(max_chain))`` rounds suffice — 10 rounds cover
chains of 1024 hops, far past anything a real crawl tolerates.

Scale shape per round: ONE self-join of the pointer table on the
current target (shuffle on the join key, hash-partitioned both sides)
plus a map-side flag update; no driver state beyond the per-round
unresolved count used for early exit.  Redirect CYCLES (a→b→a) never
terminate — they are detected exactly: a pointer that is still
unresolved after the doubling rounds has walked ≥ 2^rounds hops, which
at default rounds exceeds any acyclic chain the dedup admits, so it is
flagged ``is_cycle`` instead of looping forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def redirect_pointers(redirects: DataFrame) -> DataFrame:
    """(src, dst) — one deterministic pointer per source.

    Multiple recorded targets for one src (scheme variants, repeated
    fetches) collapse to the minimum dst; self-redirects are dropped.
    """
    return (
        redirects.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )


def resolve_redirects(
    redirects: DataFrame,
    max_rounds: int = 10,
) -> DataFrame:
    """(src, final, hops, is_cycle) — terminal target of every source.

    ``final`` is the first non-source URL on the chain (a terminal: it
    has no outgoing pointer), ``hops`` the exact chain length walked.
    Sources on a redirect cycle get ``is_cycle = true`` and ``final`` =
    the pointer reached after ``2^max_rounds`` hops (deterministic, but
    not terminal).  Chains longer than ``2^max_rounds`` are reported as
    cycles — at the default that is a 1024-hop chain, which no crawler
    follows.
    """
    ptr = redirect_pointers(redirects)
    # state: src → (cur target, exact hops walked, done?).  done means
    # cur is TERMINAL (not itself a redirect source).  The state table
    # doubles as the jump table — following src's pointer through cur's
    # OWN state row composes the two walked paths, so reach doubles per
    # round and finished suffixes transfer their exact hop counts.
    state = (
        ptr.select("src", F.col("dst").alias("cur"), F.lit(1).cast("long").alias("hops"))
        .join(
            ptr.select(F.col("src").alias("cur"), F.lit(True).alias("_k")),
            "cur",
            "left",
        )
        .select("src", "cur", "hops", F.col("_k").isNull().alias("done"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_open = state.filter(~F.col("done")).count()

    for _ in range(max_rounds):
        if n_open == 0:
            break
        stepped = (
            state.join(
                state.select(
                    F.col("src").alias("cur"),
                    F.col("cur").alias("_ncur"),
                    F.col("hops").alias("_nhops"),
                    F.col("done").alias("_ndone"),
                ).hint("shuffle_hash"),
                "cur",
                "left",
            )
            .select(
                "src",
                F.when(F.col("done"), F.col("cur")).otherwise(F.col("_ncur")).alias("cur"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.col("_nhops"))
                .alias("hops"),
                F.when(F.col("done"), F.lit(True)).otherwise(F.col("_ndone")).alias("done"),
            )
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_open = stepped.filter(~F.col("done")).count()
        state.unpersist()
        state = stepped

    out = state.select(
        "src",
        F.col("cur").alias("final"),
        "hops",
        (~F.col("done")).alias("is_cycle"),
    ).localCheckpoint(eager=True)
    state.unpersist()
    return out


def rewrite_edges(
    edges: DataFrame,
    resolved: DataFrame,
    drop_cycles: bool = True,
) -> DataFrame:
    """Rewrite (src_id, dst_id) endpoints through a resolved redirect map
    keyed on the same id domain: every endpoint that appears as a
    redirect source is replaced by its terminal target, then self-loops
    are dropped and duplicates collapsed.  Two broadcast-or-shuffle hash
    joins; cycle members are excluded from the map (their "final" is
    arbitrary mid-cycle) unless ``drop_cycles=False``.
    """
    m = resolved if not drop_cycles else resolved.filter(~F.col("is_cycle"))
    m = m.select("src", "final")
    out = (
        edges.join(
            m.select(F.col("src").alias("src_id"), F.col("final").alias("_sf")),
            "src_id",
            "left",
        )
        .join(
            m.select(F.col("src").alias("dst_id"), F.col("final").alias("_df")),
            "dst_id",
            "left",
        )
        .select(
            F.coalesce("_sf", "src_id").alias("src_id"),
            F.coalesce("_df", "dst_id").alias("dst_id"),
        )
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )
    return out
