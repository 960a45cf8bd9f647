"""Deterministic random walks over the edge table — graph training corpora.

node2vec/DeepWalk-style pipelines need walk sequences sampled from the
link graph as model input. RNG-state walks are irreproducible across
retries and cluster sizes, so the transition choice here is a pure
function of (start, walk_no, step, candidate): at each step the walker
moves to the out-neighbor minimizing a per-edge hash. That is a uniform
choice over neighbors (hash ranks are exchangeable), yet two runs — or
two engines — produce the identical corpus.

Scale shape: step k is ONE hash join (frontier ⋈ edges on the current
vertex, the frontier is O(V·walks) rows and edges stay put on their
src_id partitioning) plus a bounded top-1 window per walk. walk_length L
costs L such rounds; the frontier only shrinks (walks die at dangling
vertices). No RNG state, no driver action, fully lazy until the caller
materializes.

``hash='md5'`` is the engine-portable variant (DuckDB computes the same
hex string, so the oracle SQL reproduces every transition exactly);
'xxhash64' is the cheaper JVM default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _step_score(step: int, hash: str, seed: int):
    if hash == "md5":
        return F.md5(
            F.encode(
                F.concat_ws(
                    "~",
                    F.col("start_id").cast("string"),
                    F.col("walk_no").cast("string"),
                    F.lit(str(step)),
                    F.col("dst_id").cast("string"),
                ),
                "UTF-8",
            )
        )
    return F.xxhash64(
        "start_id", "walk_no", F.lit(step), "dst_id", F.lit(seed)
    ).cast("string")


def random_walks(
    edges: DataFrame,
    walk_length: int,
    walks_per_vertex: int = 1,
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """(start_id, walk_no, step, vertex_id) — hash-deterministic walks.

    Step 0 is the start vertex itself (every vertex with >=1 out-edge
    starts ``walks_per_vertex`` walks); step k's vertex is the
    hash-argmin out-neighbor of step k-1's. Walks reaching a dangling
    vertex stop early, so rows per walk range from 1 to walk_length+1.
    """
    starts = (
        edges.select(F.col("src_id").alias("start_id"))
        .distinct()
        .select(
            "start_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
            ).alias("walk_no"),
        )
    )
    frontier = starts.select(
        "start_id", "walk_no", F.col("start_id").alias("vertex_id")
    )
    parts = [
        frontier.select(
            "start_id", "walk_no", F.lit(0).alias("step"), "vertex_id"
        )
    ]
    # dst tiebreak guards the (astronomically unlikely) hash collision —
    # the choice must be total for determinism
    w = Window.partitionBy("start_id", "walk_no").orderBy(
        F.col("_score").asc(), F.col("dst_id").asc()
    )
    for k in range(1, walk_length + 1):
        nxt = (
            frontier.join(
                edges, frontier["vertex_id"] == edges["src_id"], "inner"
            )
            .select("start_id", "walk_no", "dst_id")
            .withColumn("_score", _step_score(k, hash, seed))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("start_id", "walk_no", F.col("dst_id").alias("vertex_id"))
        )
        # node2vec-length walks (40-80 steps) chain that many joins: without
        # periodic truncation Catalyst re-analyzes an O(L)-deep plan at
        # every added step (O(L^2) total) and the final union references
        # every intermediate. Cut lineage every 8 steps; the eager
        # materialization is one bounded O(V·walks) frame.
        if k % 8 == 0 and k < walk_length:
            nxt = nxt.localCheckpoint(eager=True)
        parts.append(
            nxt.select(
                "start_id", "walk_no", F.lit(k).alias("step"), "vertex_id"
            )
        )
        frontier = nxt
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _walk_uniform(step: int, hash: str, seed: int):
    """Deterministic per-candidate uniform in (0,1): u = (h32 + 0.5)/2^32."""
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
                            F.col("dst_id").cast("string"),
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
            "start_id", "walk_no", F.lit(step), "dst_id", F.lit(seed)
        ).bitwiseAND(F.lit((1 << 32) - 1))
    return (h + F.lit(0.5)) / F.lit(float(1 << 32))


def node2vec_walks(
    edges: DataFrame,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_vertex: int = 1,
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """(start_id, walk_no, step, vertex_id) — second-order biased walks
    (node2vec, Grover & Leskovec 2016), still fully deterministic.

    Transition weight from (prev → cur) to dst: 1/p if dst == prev
    (return), 1 if dst is adjacent to prev (BFS-ish), 1/q otherwise
    (DFS-ish). The weighted choice is an exponential race — dst minimizes
    ``−ln(u)/α`` with u a pure hash of (start, walk_no, step, dst) — the
    same A-ES construction as ``importance_resample``, so the draw IS
    distributed ∝ α yet reproducible across engines, reruns, and
    partitionings (key rounded to 8 + dst tiebreak, as elsewhere).

    Per step beyond the first: TWO edge-keyed joins (frontier ⋈ out-edges
    on cur; candidates ⋈ edges on (prev, dst) for the adjacency flag) and
    a bounded per-walk window — a hub walker pays O(out-degree) rows per
    step, which is inherent to node2vec's normalization. Step 1 is
    uniform (no prev yet). Use dyadic p/q for bit-exact oracle mirrors.
    """
    e = edges.select("src_id", "dst_id").distinct()
    starts = (
        e.select(F.col("src_id").alias("start_id"))
        .distinct()
        .select(
            "start_id",
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias(
                "walk_no"
            ),
        )
    )
    parts = [
        starts.select(
            "start_id", "walk_no", F.lit(0).alias("step"),
            F.col("start_id").alias("vertex_id"),
        )
    ]
    # frontier carries the walk's 2nd-order state: (prev_id, vertex_id)
    frontier = starts.select(
        "start_id", "walk_no",
        F.lit(None).cast("long").alias("prev_id"),
        F.col("start_id").alias("vertex_id"),
    )
    adj = e.select(
        F.col("src_id").alias("prev_id"), F.col("dst_id").alias("dst_id"),
        F.lit(1).alias("_adj"),
    )
    w = Window.partitionBy("start_id", "walk_no").orderBy(
        F.col("_key").asc(), F.col("dst_id").asc()
    )
    for k in range(1, walk_length + 1):
        cand = frontier.join(e, frontier["vertex_id"] == e["src_id"]).select(
            "start_id", "walk_no", "prev_id",
            frontier["vertex_id"].alias("cur_id"), "dst_id",
        )
        if k == 1:
            alpha = F.lit(1.0)
        else:
            cand = cand.join(adj, ["prev_id", "dst_id"], "left")
            alpha = (
                F.when(F.col("dst_id") == F.col("prev_id"), F.lit(1.0 / p))
                .when(F.col("_adj").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(1.0 / q))
            )
        key = F.round(-F.log(_walk_uniform(k, hash, seed)) / alpha, 8)
        nxt = (
            cand.withColumn("_key", key)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "start_id", "walk_no",
                F.col("cur_id").alias("prev_id"),
                F.col("dst_id").alias("vertex_id"),
            )
        )
        if k % 8 == 0 and k < walk_length:
            nxt = nxt.localCheckpoint(eager=True)
        parts.append(
            nxt.select(
                "start_id", "walk_no", F.lit(k).alias("step"), "vertex_id"
            )
        )
        frontier = nxt
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionAll(pt)
    return out


def skipgram_pairs(
    walks: DataFrame, window: int = 2, symmetric: bool = True
) -> DataFrame:
    """(center_id, context_id, rel_pos) skip-gram training pairs from a
    walk corpus (:func:`random_walks` / :func:`node2vec_walks` output:
    start_id, walk_no, step, vertex_id) — the positive-pair half of the
    SGNS pipeline (negatives: :func:`~amanogawa_spark.graph.negsample.
    degree_negative_samples`). Word2vec's sentence window applied to
    walks, as in DeepWalk/node2vec.

    Emits every ordered pair within ``window`` steps on the same walk
    (multiplicities preserved — SGNS trains on the pair STREAM, so a
    co-occurrence appearing in 3 walks is 3 training rows);
    ``rel_pos = context_step - center_step`` (signed, never 0).
    ``symmetric=False`` keeps only forward contexts (rel_pos > 0) —
    half the rows, for trainers that mirror pairs themselves.

    Spark shape: ONE self-equi-join on the walk key (start_id, walk_no)
    with a bounded |step delta| filter — both sides shuffle on the same
    key once, the join is walk-local, and output is ≤ 2·window rows per
    walk step. No window function, no per-walk array materialization,
    so a 10^11-row walk corpus streams through hash join partitions.
    """
    a = walks.select(
        "start_id",
        "walk_no",
        F.col("step").alias("_i"),
        F.col("vertex_id").alias("center_id"),
    )
    b = walks.select(
        "start_id",
        "walk_no",
        F.col("step").alias("_j"),
        F.col("vertex_id").alias("context_id"),
    )
    lo = -window if symmetric else 1
    delta = F.col("_j") - F.col("_i")
    return (
        a.join(b, ["start_id", "walk_no"])
        .filter((delta >= lo) & (delta <= window) & (delta != 0))
        .select(
            "center_id",
            "context_id",
            delta.cast("int").alias("rel_pos"),
        )
    )
