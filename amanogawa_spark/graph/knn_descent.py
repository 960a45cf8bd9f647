"""NN-Descent approximate kNN as an iterative DataFrame program.

Reference parity: ``plugin/flow/to_graph/nndescent.h:24-393`` — random
K-neighbor init (h:148-196), per-epoch ρ-sampling of unchecked neighbors
(h:282-313), reverse-neighbor lists (h:93-105), the local join comparing
neighbors-of-neighbors (h:315-377), bounded top-K merge (h:212-280), and
the convergence rule *updates ≤ δ·K·N* (h:127-136). The reference is
seeded-deterministic (``mt19937(0)``, h:57); here every random choice is
an ``xxhash64`` of (seed, id, counter) so the program is deterministic
under any partitioning or cluster size — no RNG state to thread.

Spark shape per epoch (all built-in ops):
  sample (hash-ranked window) → reverse lists (projection) →
  local join (self-join on the pivot id) → cosine via zip_with/aggregate →
  top-K merge (window) → update count (anti-join-free: flag comparison).

This is the graph-construction path for dense-vector inputs when the
O(n²) exact kNN is out of reach; LSH (operators/similarity.py) is the
bucket-join alternative. Both emit the same (src_id, dst_id) edge shape
as the reference's to_graph.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.operators.similarity import _dot, _norm


@dataclass
class NNDescentResult:
    neighbors: DataFrame  # (id long, nbr long, sim double)
    epochs: int
    last_updates: int


def nn_descent(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rho: float = 0.5,
    delta: float = 0.001,
    max_epochs: int = 10,
    seed: int = 0,
    init_hash: str = "xxhash64",
) -> NNDescentResult:
    """``init_hash``: 'xxhash64' (production default) or 'md5' — the
    engine-portable random init. At rho=1.0 every neighbor is sampled each
    epoch, so the per-epoch hash ORDER becomes a no-op and md5 init makes
    the whole program reproducible in a DuckDB unrolled-CTE oracle."""
    spark = df.sparkSession

    # unit-normalized vectors so pair similarity is a pure dot
    unit = (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
        .select("id", F.transform("v", lambda x: x / _norm(F.col("v"))).alias("u"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = unit.count()
    if n <= k:
        # degenerate: brute force
        a = unit.select(F.col("id").alias("qid"), F.col("u").alias("ua"))
        b = unit.select(F.col("id").alias("nid"), F.col("u").alias("ub"))
        sims = (
            a.crossJoin(b)
            .filter(F.col("qid") != F.col("nid"))
            .select(F.col("qid").alias("id"), F.col("nid").alias("nbr"), _dot(F.col("ua"), F.col("ub")).alias("sim"))
        )
        return NNDescentResult(sims, 0, 0)

    # dense ordinal index for random-init addressing; built with the
    # range-partitioned two-pass ranker (NOT a global single-partition window)
    from amanogawa_spark.graph.build import dense_rank_ids

    # the ranker's returned frame IS persisted (columns id, ord) — keep the
    # handle directly so the unpersist at the end actually releases it
    idx = dense_rank_ids(unit.select("id"), "id", out_col="ord")

    # init: K pseudo-random distinct neighbors per id (h:148-196)
    if init_hash == "md5":
        init_h = F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(
                            "_", F.col("id").cast("string"), F.col("t").cast("string")
                        ),
                        "UTF-8",
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    else:
        init_h = F.xxhash64("id", "t", F.lit(seed))
    cand_init = (
        idx.select("id", "ord")
        .select(
            "id",
            "ord",
            F.explode(F.array(*[F.lit(t) for t in range(k + 2)])).alias("t"),
        )
        .select(
            "id",
            ((init_h % n + n) % n).alias("nbr_ord"),
        )
    )
    init = (
        cand_init.join(
            idx.select(F.col("ord").alias("nbr_ord"), F.col("id").alias("nbr")),
            "nbr_ord",
        )
        .filter(F.col("id") != F.col("nbr"))
        .dropDuplicates(["id", "nbr"])
    )

    def _with_sims(pairs: DataFrame) -> DataFrame:
        """(id, nbr) → (id, nbr, sim) via the unit vectors."""
        return (
            pairs.join(unit.select(F.col("id"), F.col("u").alias("ua")), "id")
            .join(unit.select(F.col("id").alias("nbr"), F.col("u").alias("ub")), "nbr")
            .select("id", "nbr", _dot(F.col("ua"), F.col("ub")).alias("sim"))
        )

    w_topk = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("nbr"))
    B = (
        _with_sims(init)
        .withColumn("rn", F.row_number().over(w_topk))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .withColumn("is_new", F.lit(True))
        .localCheckpoint(eager=True)
    )

    sample_k = max(1, int(rho * k))
    # reference stop rule: updates <= delta * rho * K * N (nndescent.h:127-136),
    # compared as a float — int truncation would demand exactly 0 updates on
    # small graphs
    threshold = delta * rho * k * n
    epochs = 0
    updates = threshold + 1
    while epochs < max_epochs and updates > threshold:
        epochs += 1
        # ρ-sample of new entries per id (deterministic hash order, h:282-313)
        w_samp = Window.partitionBy("id").orderBy(
            F.xxhash64("id", "nbr", F.lit(seed + epochs))
        )
        new_s = (
            B.filter("is_new")
            .withColumn("srn", F.row_number().over(w_samp))
            .filter(F.col("srn") <= sample_k)
            .select("id", "nbr")
        )
        old_s = (
            B.filter(~F.col("is_new"))
            .withColumn("srn", F.row_number().over(w_samp))
            .filter(F.col("srn") <= sample_k)
            .select("id", "nbr")
        )
        # forward + reverse candidate lists (h:93-105)
        fwd = new_s.union(old_s)
        rev = fwd.select(F.col("nbr").alias("id"), F.col("id").alias("nbr"))
        cand = fwd.union(rev).distinct().persist(StorageLevel.MEMORY_AND_DISK)
        # local join: all pairs sharing a pivot, new x (new ∪ old) (h:315-377)
        a = cand.select(F.col("id").alias("pivot"), F.col("nbr").alias("x"))
        b = cand.select(F.col("id").alias("pivot"), F.col("nbr").alias("y"))
        pairs = (
            a.join(b, "pivot")
            .filter(F.col("x") < F.col("y"))
            .select(F.col("x").alias("id"), F.col("y").alias("nbr"))
            .distinct()
        )
        sims = _with_sims(pairs)
        upd = sims.unionByName(
            sims.select(F.col("nbr").alias("id"), F.col("id").alias("nbr"), "sim")
        ).withColumn("is_new", F.lit(True))
        # sampled-new entries become checked (h:296-299)
        B_marked = (
            B.join(
                new_s.withColumn("was_sampled", F.lit(True)),
                ["id", "nbr"],
                "left",
            )
            .withColumn("is_new", F.col("is_new") & F.col("was_sampled").isNull())
            .drop("was_sampled")
        )
        all_rows = B_marked.unionByName(upd)
        # keep best (max sim) per (id, nbr); a re-proposed existing neighbor
        # must NOT count as new — aggregate is_new as min (False wins)
        dedup = all_rows.groupBy("id", "nbr").agg(
            F.max("sim").alias("sim"), F.min("is_new").alias("is_new")
        )
        newB = (
            dedup.withColumn("rn", F.row_number().over(w_topk))
            .filter(F.col("rn") <= k)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
        # convergence counter = THIS epoch's list insertions (reference
        # nndescent.h:127-136 counts per-epoch inserts). Counting the
        # standing `is_new` inventory instead never converges: with ρ<1
        # unsampled entries keep is_new=True across epochs, so that count
        # stays ~O(kN) >> δkN even on a fully converged graph.
        updates = newB.join(B.select("id", "nbr"), ["id", "nbr"], "left_anti").count()
        cand.unpersist()
        B = newB

    unit.unpersist()
    idx.unpersist()
    return NNDescentResult(B.select("id", "nbr", "sim"), epochs, updates)


def nn_descent_knn_graph(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    **kwargs,
) -> DataFrame:
    """Undirected deduped kNN edge table via NN-Descent (to_graph approx mode)."""
    res = nn_descent(df, id_col, vec_col, k=k, **kwargs)
    return (
        res.neighbors.select(
            F.least("id", "nbr").alias("src_id"), F.greatest("id", "nbr").alias("dst_id")
        )
        .distinct()
    )
