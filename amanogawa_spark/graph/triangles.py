"""Triangle counting via degree-ordered orientation + adjacency intersection.

Classic MapReduce formulation (Suri & Vassilvitskii, WWW'11): orient each
undirected edge from the lower-(degree, id) endpoint to the higher one —
every triangle is counted exactly once, and the orientation bounds each
vertex's out-list by O(sqrt(m)), which kills the hub-vertex wedge blowup
(the skew story at web scale).

Spark shape: wedges = oriented ⋈ oriented on the pivot (shuffle on u),
then a semi-join of (v, w) against the oriented edge set. All hash joins
+ one hash agg; AQE skew-split handles residual pivot skew.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class TriangleResult:
    total: int
    # (id long, triangles long) — vertices in >=1 triangle; None when the
    # scale gate auto-routed to the DOULION estimate (total-only)
    per_vertex: DataFrame | None


def _oriented_edges(edges: DataFrame) -> DataFrame:
    """Undirected dedup then orient by (degree, id) ascending."""
    und = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b")), "b")
    )
    # orient low (deg, id) → high (deg, id)
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )


def triangle_count(
    edges: DataFrame,
    max_exact_edges: int = 50_000_000,
    on_large: str = "error",
    doulion_p: float = 0.1,
) -> TriangleResult:
    """Exact triangle count — with a scale gate.

    The exact wedge join materializes O(m^{3/2}) rows through a shuffle;
    measured to exceed single-box disk (>180 GB spill) at 5·10^7 skewed
    edges (BENCH/BASELINE.md §3b). Above ``max_exact_edges`` undirected
    edges the default is therefore to REFUSE with guidance rather than
    fill the cluster's disks:

    - ``on_large='error'`` (default): raise ValueError naming the
      web-scale alternatives.
    - ``on_large='approx'``: auto-route to DOULION
      (:func:`triangle_total_approx` at ``doulion_p``) — the returned
      ``total`` is the (unbiased) estimate rounded to int and
      ``per_vertex`` is ``None`` (no per-vertex counts on that path).
    - ``on_large='exact'``: override the gate and run the exact join
      anyway.
    """
    if on_large not in ("error", "approx", "exact"):
        raise ValueError("triangle_count: on_large must be error|approx|exact")
    oriented = _oriented_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    m = oriented.count()
    if m > max_exact_edges and on_large != "exact":
        oriented.unpersist()
        if on_large == "error":
            raise ValueError(
                f"triangle_count: {m} undirected edges exceeds the exact-"
                f"join gate ({max_exact_edges}); the O(m^1.5) wedge "
                "shuffle is a measured disk-filler at this scale. Use "
                "triangle_total_approx (DOULION, unbiased), pass "
                "on_large='approx' to auto-route, or on_large='exact' to "
                "override."
            )
        est = triangle_total_approx(edges, p=doulion_p).first()
        return TriangleResult(
            total=int(round(est["n_triangles_est"])), per_vertex=None
        )
    e1 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("y"))
    wedges = e1.join(e2, "pivot").filter(F.col("x") < F.col("y"))
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        oriented.select(F.col("v").alias("x"), F.col("u").alias("y"))
    ).distinct()
    triangles = wedges.join(closing, ["x", "y"], "inner").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    total = triangles.count()
    per_vertex = (
        triangles.select(F.col("pivot").alias("id"))
        .union(triangles.select(F.col("x").alias("id")))
        .union(triangles.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    oriented.unpersist()
    return TriangleResult(total=total, per_vertex=per_vertex)


def triangle_total_approx(
    edges: DataFrame, p: float = 0.1, seed: int = 7, coin: str = "xxhash64"
) -> DataFrame:
    """DOULION-style approximate global triangle count (Tsourakakis et al.,
    KDD'09): keep each undirected edge independently with probability ``p``
    (deterministic per-edge coin — reproducible across partitionings),
    count triangles exactly on the sparsified graph, scale by 1/p^3.
    Unbiased; relative error ~ 1/sqrt(p^3 * T).

    ``coin``: 'xxhash64' (default, cheapest — JVM codegen) or 'md5' (32
    uniform bits from the first 8 hex chars of md5("a~b") — engine-portable,
    so a DuckDB oracle reproduces the sample and therefore the exact
    estimate; seed is ignored for md5).

    This is the web-scale path: the exact wedge join materializes
    O(m^{3/2}) rows through a shuffle — measured to exceed single-box disk
    at 5*10^7 edges with hub skew (>180 GB spill) — while the sparsified
    graph's wedge volume shrinks by ~p^{3/2}. One-row DataFrame
    (n_triangles_est double, p double).
    """
    und = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )
    threshold = int(p * (1 << 32))
    if coin == "md5":
        h32 = F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws("~", F.col("a").cast("string"), F.col("b").cast("string")),
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
        h32 = F.xxhash64("a", "b", F.lit(seed)).bitwiseAND(F.lit((1 << 32) - 1))
    kept = und.filter(h32 < threshold).select(
        F.col("a").alias("src_id"), F.col("b").alias("dst_id")
    )
    exact = triangle_total(kept)
    return exact.select(
        (F.col("n_triangles") / F.lit(p**3)).alias("n_triangles_est"),
        F.lit(float(p)).alias("p"),
    )


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) for every vertex (0 when in no triangle) — fully
    lazy: no driver action, so it composes into larger plans. Same
    degree-ordered orientation as :func:`triangle_count`; the per-vertex
    attribution unions the three corner roles before one hash agg."""
    und = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    oriented = _oriented_edges(edges)
    e1 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("y"))
    wedges = e1.join(e2, "pivot").filter(F.col("x") < F.col("y"))
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        oriented.select(F.col("v").alias("x"), F.col("u").alias("y"))
    ).distinct()
    tri = wedges.join(closing, ["x", "y"], "inner")
    tpv = (
        tri.select(F.col("pivot").alias("id"))
        .union(tri.select(F.col("x").alias("id")))
        .union(tri.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return deg.join(tpv, "id", "left").select(
        "id", "deg", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: 2·T(v) / (deg(v)·(deg(v)−1)),
    0 for degree < 2 — the standard web-graph cohesion measure (how close a
    vertex's neighborhood is to a clique). Exact; inherits the O(√m)
    wedge bound from the degree-ordered orientation, so the same scale
    caveat as exact counting applies (use DOULION-style sampling upstream
    for dense 10^10-edge graphs)."""
    tpv = triangles_per_vertex(edges)
    return tpv.select(
        "id",
        "triangles",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def edge_triangle_support(edges: DataFrame) -> DataFrame:
    """(a, b, support) — triangles through each canonical undirected edge.
    Degree-ordered wedge enumeration (each triangle found once) exploded
    to its three edges + one hash aggregate; edges in no triangle are
    absent (support 0)."""
    oriented = _oriented_edges(edges)
    e1 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("y"))
    wedges = e1.join(e2, "pivot").filter(F.col("x") < F.col("y"))
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        oriented.select(F.col("v").alias("x"), F.col("u").alias("y"))
    ).distinct()
    tri = wedges.join(closing, ["x", "y"], "inner")
    edge_keys = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("pivot", "x").alias("a"),
                    F.greatest("pivot", "x").alias("b"),
                ),
                F.struct(
                    F.least("pivot", "y").alias("a"),
                    F.greatest("pivot", "y").alias("b"),
                ),
                F.struct(
                    F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return edge_keys.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("support")
    )


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """(a, b) — canonical undirected edges of the k-truss: the maximal
    subgraph where every edge closes >= k-2 triangles WITHIN the subgraph
    (Cohen 2008). Stronger cohesion than k-core (which bounds degrees,
    not shared neighborhoods) — the community-core extractor for link
    farms / tightly-knit topic clusters.

    Peel loop: recompute per-edge support on the surviving subgraph,
    drop under-supported edges, repeat to fixpoint (``fixed_rounds``
    skips the convergence check — the SQL-oracle variant). Each round is
    the degree-ordered wedge join, so the O(√m) orientation bound and
    the same exact-counting scale caveat apply per round.
    """
    cur = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if k <= 2:
        # every edge trivially satisfies support >= 0; hand back a
        # checkpointed frame and release the cache rather than leaking the
        # persisted handle for the session lifetime
        out = cur.localCheckpoint(eager=True)
        cur.unpersist()
        return out
    n_cur = cur.count()
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for _ in range(rounds):
        sup = edge_triangle_support(
            cur.select(F.col("a").alias("src_id"), F.col("b").alias("dst_id"))
        )
        nxt = (
            cur.join(sup, ["a", "b"], "inner")
            .filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        cur.unpersist()
        cur = nxt.persist(StorageLevel.MEMORY_AND_DISK)
        if fixed_rounds is None:
            n_new = cur.count()
            if n_new == n_cur:
                break
            n_cur = n_new
    out = cur.localCheckpoint(eager=True)
    cur.unpersist()
    return out


def triangle_total(edges: DataFrame) -> DataFrame:
    """One-row DataFrame (n_triangles long) — the SQL-oracle-friendly shape."""
    oriented = _oriented_edges(edges)
    e1 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("y"))
    wedges = e1.join(e2, "pivot").filter(F.col("x") < F.col("y"))
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        oriented.select(F.col("v").alias("x"), F.col("u").alias("y"))
    ).distinct()
    return wedges.join(closing, ["x", "y"], "inner").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
