"""Landmark (sketch-based) distance estimation.

Exact all-pairs shortest paths is hopeless at web scale (|V|² state); the
standard answer (Das Sarma et al., "A sketch-based distance oracle for
web-scale graphs", WSDM 2010) is to BFS from a small landmark set once,
store each vertex's distance vector to the landmarks (an O(|V|·L) sketch),
and answer pair queries with the triangle-inequality upper bound

    d̂(u, v) = min over landmarks l of  d(l, u) + d(l, v)

which is exact whenever some landmark lies on a shortest u–v path — the
reason high-degree hubs make good landmarks on power-law webgraphs.

Scale design: the sketch build is |L| simultaneous BFS frontiers in ONE
loop (:func:`~amanogawa_spark.graph.sssp.bfs_levels` is already
multi-source — the landmark dimension rides inside the frontier rows, so
adding landmarks adds rows, not rounds); pair estimation is two hash
joins + one map-side-combined min — no iteration, no all-pairs state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.graph.build import degrees
from amanogawa_spark.graph.sssp import bfs_levels


def select_landmarks(
    edges: DataFrame, n: int = 16, method: str = "degree"
) -> list[int]:
    """Pick ``n`` landmark vertex ids (driver-side list — landmarks are
    few by design).

    ``degree``: highest total degree first (hubs lie on many shortest
    paths — the selection the sketch paper recommends); ``hash``:
    deterministic pseudo-uniform (xxhash order). Ties break on id.
    """
    d = degrees(edges)
    if method == "degree":
        ranked = d.orderBy(
            F.desc(F.coalesce("out_degree", F.lit(0)) + F.coalesce("in_degree", F.lit(0))),
            F.asc("id"),
        )
    elif method == "hash":
        ranked = d.orderBy(F.xxhash64("id").asc(), F.asc("id"))
    else:
        raise ValueError(f"unknown landmark method: {method}")
    return [int(r["id"]) for r in ranked.limit(n).collect()]


def landmark_distances(
    edges: DataFrame, landmarks: list[int], max_rounds: int = 64,
    reverse: bool = False,
) -> DataFrame:
    """(landmark, id, dist): hop distance from every landmark — the sketch.

    One multi-source BFS loop; unreached (landmark, vertex) pairs are
    absent. ``reverse=True`` BFS-es the transposed graph, giving d(id →
    landmark) — the second sketch a *directed* estimate needs."""
    e = (
        edges.select(
            F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
        )
        if reverse
        else edges
    )
    return bfs_levels(e, landmarks, max_rounds=max_rounds).select(
        F.col("source").alias("landmark"), "id", "dist"
    )


def estimate_distances(
    dists: DataFrame, pairs: DataFrame, dists_to: DataFrame | None = None
) -> DataFrame:
    """(u, v, dist_est): triangle-inequality upper bound per queried pair.

    Undirected graphs (symmetrized edge table): pass the one forward
    sketch — d̂(u,v) = min_l d(l,u) + d(l,v) ≥ d(u,v), exact iff some
    landmark sits on a shortest u–v path. Directed d(u→v): pass the
    ``reverse=True`` sketch as ``dists`` (d(u→l)) and the forward sketch
    as ``dists_to`` (d(l→v)) — d̂ = min_l d(u→l) + d(l→v).

    A pair appears in the output only if at least one landmark connects
    both endpoints."""
    if dists_to is None:
        dists_to = dists
    du = dists.select("landmark", F.col("id").alias("u"), F.col("dist").alias("du"))
    dv = dists_to.select("landmark", F.col("id").alias("v"), F.col("dist").alias("dv"))
    return (
        pairs.join(du, "u")
        .join(dv, ["landmark", "v"])
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("dist_est"))
    )
