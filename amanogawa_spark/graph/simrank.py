"""SimRank structural similarity over co-citation candidate pairs.

SimRank (Jeh & Widom, KDD 2002): s(a,b) = C/(|I(a)||I(b)|) ·
Σ_{i∈I(a), j∈I(b)} s(i,j), s(v,v) = 1, over in-neighbor sets I(·).
Full SimRank carries O(V²) pair state — untouchable at web scale — so
this implementation iterates only over the CO-CITATION SUPPORT: pairs
that share at least one in-neighbor. That is exactly the set with
nonzero first-iteration score, and restricting later iterations to it
is the standard candidate-pruning approximation (pairs coupled only
through longer even-length chains are treated as 0). The DuckDB oracle
mirrors the SAME restricted semantics, and the pytest oracle checks
the restricted recurrence against a dense numpy mirror on a small
graph.

Scale shape: candidate generation is the co-citation self-join
(bounded by Σ_i outfan(i)²; ``max_in_degree`` caps hub fan-in the same
way the LSH band guard caps hot buckets), and each iteration is two
edge-sized joins against the pair table plus one aggregate. State is
O(|P|), not O(V²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def simrank_pairs(
    edges: DataFrame,
    iterations: int = 2,
    c: float = 0.8,
    max_in_degree: int | None = None,
) -> DataFrame:
    """(a, b, score) for canonical a < b co-cited pairs, ``iterations`` deep.

    ``max_in_degree``: drop vertices whose in-degree exceeds the cap
    before pairing (hub guard — a page cited by everything co-cites
    everything and carries no signal; same rationale as the reference's
    bounded kNN lists, `nndescent.h` K-capped neighbor sets). None = no
    cap (exact restricted semantics, oracle mode).
    """
    ine = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(F.col("dst_id").alias("v"), F.col("src_id").alias("i"))
        .distinct()
    )
    if max_in_degree is not None:
        keep = (
            ine.groupBy("v")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_in_degree)
            .select("v")
        )
        ine = ine.join(keep, "v", "left_semi")
    ine = ine.persist(StorageLevel.MEMORY_AND_DISK)
    deg = ine.groupBy("v").agg(F.count("*").alias("d"))

    # candidate pairs + first iteration in one pass:
    # s1(a,b) = c * |I(a) ∩ I(b)| / (d(a)·d(b))
    common = (
        ine.alias("x")
        .join(ine.alias("y"), F.col("x.i") == F.col("y.i"))
        .filter(F.col("x.v") < F.col("y.v"))
        .groupBy(F.col("x.v").alias("a"), F.col("y.v").alias("b"))
        .agg(F.count("*").alias("n_common"))
    )
    pairs = (
        common.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    s = pairs.select(
        "a",
        "b",
        (F.lit(c) * F.col("n_common") / (F.col("da") * F.col("db"))).alias("score"),
    )
    for _ in range(iterations - 1):
        s_c = s.localCheckpoint(eager=True)
        # expand each pair to its in-neighbor product and score the
        # (i, j) legs: 1 on the diagonal, previous score off-diagonal
        # (canonicalized a<b lookup), 0 outside the support
        legs = (
            pairs.select("a", "b", "da", "db")
            .join(ine.select(F.col("v").alias("a"), F.col("i").alias("ia")), "a")
            .join(ine.select(F.col("v").alias("b"), F.col("i").alias("ib")), "b")
        )
        looked = legs.join(
            s_c.select(
                F.col("a").alias("la"), F.col("b").alias("lb"), F.col("score").alias("prev")
            ),
            (F.least("ia", "ib") == F.col("la"))
            & (F.greatest("ia", "ib") == F.col("lb")),
            "left",
        ).select(
            "a",
            "b",
            "da",
            "db",
            F.when(F.col("ia") == F.col("ib"), F.lit(1.0))
            .otherwise(F.coalesce("prev", F.lit(0.0)))
            .alias("leg"),
        )
        # eager checkpoint BEFORE releasing the previous round — a
        # freed localCheckpoint cannot recompute, so nxt must be
        # materialized while s_c's blocks are still alive
        nxt = (
            looked.groupBy("a", "b", "da", "db")
            .agg(F.sum("leg").alias("leg_sum"))
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("leg_sum") / (F.col("da") * F.col("db"))).alias(
                    "score"
                ),
            )
            .localCheckpoint(eager=True)
        )
        s_c.unpersist()
        s = nxt
    out = s
    ine.unpersist()
    pairs.unpersist()
    return out
