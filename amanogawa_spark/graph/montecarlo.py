"""Monte-Carlo PageRank — complete-path visit counting (Avrachenkov,
Litvak, Nemirovsky & Osipova, "Monte Carlo methods in PageRank
computation", SIAM J. Numer. Anal. 45(2), 2007).

Why it exists next to the power-iteration family (``graph/pagerank.py``):
the iterative solver costs one edge-sized shuffle PER ITERATION to
convergence (~41 rounds on the bench graph) and every round is a global
barrier. The MC estimator replaces the barrier chain with ``R``
independent geometric-length walks per vertex — total expected work is
``n·R/(1-α)`` visits REGARDLESS of iteration count, rounds shrink
geometrically (×α per step, so a 64-step cap does ~6.7 effective steps of
work), and accuracy is tunable per run: stderr of a vertex's estimate is
O(sqrt(pr(v)·(1-α)/(n·R))). That makes it the right tool for fast
approximate ranks over a 10^12-edge graph (frontier prioritization,
quality gates) where the 1e-6-converged solver is overkill.

Estimator: start ``R`` walks at EVERY vertex; at each step a walk
continues with probability α (hash coin on (start, walk, step) — fully
deterministic and repartition-invariant, like ``graph/walks.py``) and
moves to the hash-argmin out-neighbor; walks at dangling vertices stop.
``pr(v) ≈ visits(v) · (1-α) / (n·R)``.

The reference has no PageRank at all (its `to_graph` stops at edge
emission, `plugin/flow/to_graph/to_graph.cpp:174-196`); both solver
families are engine additions for the link-graph north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.graph.walks import _step_score


def _stop_coin(step: int, hash: str, seed: int):
    """Deterministic continuation uniform for (start_id, walk_no, step) —
    independent of the neighbor draw (different tag), u = (h32+0.5)/2^32.

    NOTE: the ``md5`` branch deliberately ignores ``seed`` (as does the
    shared ``_step_score``): it exists solely for bit-parity with the
    seedless DuckDB SQL oracle, so ``hash='md5'`` always produces the same
    walks regardless of ``seed``. Use the default ``xxhash64`` branch when
    seed-variation matters."""
    if hash == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(
                            "~",
                            F.col("start_id").cast("string"),
                            F.col("walk_no").cast("string"),
                            F.lit(str(step)),
                            F.lit("stop"),
                        ),
                        "UTF-8",
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    else:
        h = F.xxhash64(
            "start_id", "walk_no", F.lit(step), F.lit("stop"), F.lit(seed)
        ).bitwiseAND(F.lit((1 << 32) - 1))
    return (h + F.lit(0.5)) / F.lit(float(1 << 32))


def pagerank_montecarlo(
    edges: DataFrame,
    alpha: float = 0.85,
    walks_per_vertex: int = 16,
    max_len: int = 64,
    hash: str = "xxhash64",
    seed: int = 7,
    renormalize: bool = False,
) -> DataFrame:
    """(id, visits, pr_est) — complete-path MC PageRank over every vertex
    of ``edges`` (src ∪ dst, so dangling vertices get their start visits).

    ``max_len`` truncates the geometric walk; the untracked tail carries
    α^max_len of the mass (α=0.85, L=64 → <1e-4). One edge join per step,
    but the frontier shrinks ×α each round and the loop breaks at the
    first empty checkpoint, so total work ≈ ``n·R/(1-α)`` visit rows.

    Bias vs the iterative solver (``graph/pagerank.py``): walks TERMINATE
    at dangling vertices here, while the solver redistributes dangling
    mass uniformly — so on dangling-heavy graphs ``sum(pr_est) < 1`` and
    every estimate is systematically low, on top of the geometric-tail
    (α^max_len) and sampling (stderr) error. Pass ``renormalize=True`` to
    rescale ``pr_est`` by the total estimated mass so scores sum to 1 and
    are comparable to the converged solver; the default ``False`` keeps
    the raw complete-path estimator (and parity with the SQL oracle).

    ``seed`` only varies the walks under the default ``hash='xxhash64'``;
    the ``md5`` branch is seedless by design (oracle parity — see
    ``_stop_coin``).
    """
    verts = (
        edges.select(F.col("src_id").alias("id"))
        .unionAll(edges.select(F.col("dst_id").alias("id")))
        .distinct()
        .persist()  # read 3x: walk starts, |V| scalar, final left join
    )
    starts = verts.select(
        F.col("id").alias("start_id"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias(
            "walk_no"
        ),
    )
    frontier = starts.select(
        "start_id", "walk_no", F.col("start_id").alias("vertex_id")
    )
    parts = [frontier.select("vertex_id")]
    w = Window.partitionBy("start_id", "walk_no").orderBy(
        F.col("_score").asc(), F.col("dst_id").asc()
    )
    for k in range(1, max_len + 1):
        alive = frontier.filter(_stop_coin(k, hash, seed) < F.lit(alpha))
        nxt = (
            alive.join(edges, alive["vertex_id"] == edges["src_id"], "inner")
            .select("start_id", "walk_no", "dst_id")
            .withColumn("_score", _step_score(k, hash, seed))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("start_id", "walk_no", F.col("dst_id").alias("vertex_id"))
        )
        if k % 8 == 0 and k < max_len:
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
        parts.append(nxt.select("vertex_id"))
        frontier = nxt
    visits = parts[0]
    for p in parts[1:]:
        visits = visits.unionAll(p)
    n = verts.count()
    scale_f = (1.0 - alpha) / (float(n) * float(walks_per_vertex))
    counted = visits.groupBy(F.col("vertex_id").alias("id")).agg(
        F.count("*").alias("visits")
    )
    out = verts.join(counted, "id", "left").select(
        "id",
        F.coalesce("visits", F.lit(0)).alias("visits"),
        (F.coalesce("visits", F.lit(0)) * F.lit(scale_f)).alias("pr_est"),
    )
    # materialize the O(V) result, then release the verts cache — leaving it
    # pinned for the session is the cache-leak pattern ADVICE flagged on
    # other operators
    out = out.localCheckpoint(eager=True)
    verts.unpersist()
    if renormalize:
        # 1-row scalar over the already-materialized O(V) result
        total_mass = out.agg(F.sum("pr_est")).first()[0] or 0.0
        if total_mass > 0.0:
            out = out.withColumn(
                "pr_est", F.col("pr_est") / F.lit(float(total_mass))
            )
    return out
