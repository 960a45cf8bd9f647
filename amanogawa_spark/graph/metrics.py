"""Per-vertex and club-level mixing metrics for the directed link graph:
average neighbour degree and the rich-club coefficient.

Together with :func:`amanogawa_spark.graph.build.reciprocity` and
:func:`amanogawa_spark.graph.build.degree_assortativity`, these are the
standard summary statistics a webgraph study reports next to the degree
histogram (Newman 2002/2003, Zhou & Mondragon 2004): whether hubs attach
to hubs, and how densely the top-k degree vertices interlink. The
reference engine stops at graph construction
(``to_graph/to_graph.cpp:88-117``) and carries no analytics inventory
(its §2.4 is empty), so — like k-core/HITS before — these extend the §2
surface with operators a link-graph user needs on day one.

Scale shape: both metrics are one or two hash-shuffles over the edge
table followed by map-side-combined aggregates; nothing is collected.
``avg_neighbor_degree`` is degree-attach + groupBy; ``rich_club`` filters
the degree table to the >k club (tiny on power-law graphs) and
semi-joins edges into it, so the numerator scan prunes to club-incident
edges only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dedup(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )


def avg_neighbor_degree(edges: DataFrame, top_k: int | None = None) -> DataFrame:
    """Per-vertex average out-degree of out-neighbours (the knn(v) curve's
    per-vertex form). Columns: ``id``, ``out_degree``, ``avg_nbr_out_deg``.

    ``top_k`` keeps only the k highest-out-degree vertices (ties broken by
    id) — the hub summary a crawl report wants — via a parallel
    TakeOrderedAndProject, never a global single-partition sort.
    """
    e = _dedup(edges)
    outd = e.groupBy("src_id").agg(F.count("*").alias("out_degree"))
    nbr = (
        e.join(
            outd.select(
                F.col("src_id").alias("dst_id"),
                F.col("out_degree").alias("nbr_out"),
            ),
            "dst_id",
        )
        .groupBy("src_id")
        .agg(F.round(F.avg("nbr_out"), 6).alias("avg_nbr_out_deg"))
    )
    res = (
        outd.join(nbr, "src_id", "left")
        .select(
            F.col("src_id").alias("id"),
            "out_degree",
            F.coalesce("avg_nbr_out_deg", F.lit(0.0)).alias("avg_nbr_out_deg"),
        )
    )
    if top_k is not None:
        res = res.orderBy(F.desc("out_degree"), "id").limit(top_k)
    return res


def rich_club(edges: DataFrame, degrees_above: list[int]) -> DataFrame:
    """Rich-club coefficient φ(k) at each threshold in ``degrees_above``:
    among vertices with total degree > k, the fraction of ordered pairs
    joined by a directed edge — φ(k) = E_club / (N_club · (N_club − 1)).

    Columns: ``k``, ``n_club``, ``e_club``, ``phi``. The club member table
    is tiny at any scale (degree thresholds prune hard on power-law
    graphs); both the member count and the club-internal edge count are
    semi-join-pruned aggregates, evaluated for all thresholds in one pass
    each via a broadcast of the threshold list.
    """
    e = _dedup(edges)
    deg = (
        e.select(F.col("src_id").alias("id"))
        .unionAll(e.select(F.col("dst_id").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    ks = F.array(*[F.lit(int(k)) for k in degrees_above])
    # member (id, k) pairs for every threshold the vertex clears
    members = deg.select(
        "id", F.explode(F.filter(ks, lambda k: F.col("degree") > k)).alias("k")
    )
    n_club = members.groupBy("k").agg(F.count("*").alias("n_club"))
    src_m = members.select(F.col("id").alias("src_id"), "k")
    dst_m = members.select(F.col("id").alias("dst_id"), "k")
    e_club = (
        e.join(src_m, "src_id")
        .join(dst_m, ["dst_id", "k"])
        .groupBy("k")
        .agg(F.count("*").alias("e_club"))
    )
    return (
        n_club.join(e_club, "k", "left")
        .select(
            "k",
            "n_club",
            F.coalesce("e_club", F.lit(0)).alias("e_club"),
            F.when(
                F.col("n_club") > 1,
                F.round(
                    F.coalesce("e_club", F.lit(0))
                    / (F.col("n_club") * (F.col("n_club") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("phi"),
        )
    )

def community_conductance(
    edges: DataFrame,
    assign: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """(label, n_vertices, volume, cut_edges, conductance) — per-community
    cut quality: φ(S) = cut(S) / min(vol(S), vol(V)−vol(S)).

    ``cut(S)`` counts directed edges with exactly one endpoint in S (each
    boundary edge charges both sides' cuts); ``vol(S)`` is the total
    (in+out) degree mass of S.  The standard community-quality diagnostic
    complementing modularity — low conductance = few escape routes.

    Spark shape: two label joins onto the edge table (the same shuffle
    envelope as one LPA round), then everything is map-side-combined
    aggregates over (label) — no per-community driver work.
    """
    a = assign.select(F.col(id_col).alias("_v"), F.col(label_col).alias("_lab"))
    lab_e = (
        edges.join(
            a.select(F.col("_v").alias("src_id"), F.col("_lab").alias("src_lab")),
            "src_id",
        ).join(
            a.select(F.col("_v").alias("dst_id"), F.col("_lab").alias("dst_lab")),
            "dst_id",
        )
    )
    # volume: total degree mass per label
    deg = (
        edges.select(F.col("src_id").alias("_v"))
        .unionAll(edges.select(F.col("dst_id").alias("_v")))
        .groupBy("_v")
        .agg(F.count("*").alias("d"))
    )
    vol = (
        deg.join(a, "_v")
        .groupBy(F.col("_lab").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum("d").cast("long").alias("volume"),
        )
    )
    # cut: boundary edges charge both sides
    boundary = lab_e.filter(F.col("src_lab") != F.col("dst_lab"))
    cut = (
        boundary.select(F.col("src_lab").alias("label"))
        .unionAll(boundary.select(F.col("dst_lab").alias("label")))
        .groupBy("label")
        .agg(F.count("*").cast("long").alias("cut_edges"))
    )
    total_vol = 2 * edges.count()
    return (
        vol.join(cut, "label", "left")
        .select(
            "label",
            "n_vertices",
            "volume",
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
            F.when(
                F.least(F.col("volume"), F.lit(total_vol) - F.col("volume")) > 0,
                F.round(
                    F.coalesce("cut_edges", F.lit(0))
                    / F.least(
                        F.col("volume"), F.lit(total_vol) - F.col("volume")
                    ).cast("double"),
                    8,
                ),
            ).alias("conductance"),
        )
    )


def double_sweep_lower_bound(
    edges: DataFrame, undirected: bool = True, max_rounds: int = 64
) -> DataFrame:
    """One-row (start_id, ecc_start, far_id, diameter_lb) — the classic
    double-sweep diameter lower bound (Magnien/Latapy/Habib): BFS from a
    high-degree start vertex, then BFS again from the farthest vertex
    found; the second eccentricity lower-bounds the true diameter and is
    empirically tight on web-like graphs. Complements HyperANF's
    q-effective diameter (graph/hyperball.py) with an EXACT bound.

    Two frontier-bounded BFS passes (``graph/sssp.shortest_paths`` —
    per-round cost tracks the frontier, not |V|) + two 1-row driver
    argmax collects. Covers the start vertex's (weakly, when
    ``undirected``) connected component; BFS is truncated at
    ``max_rounds`` hops, so the bound is exact whenever the component's
    eccentricities fit the cap. Deterministic: all argmaxes tie-break to
    the smallest vertex id.
    """
    from amanogawa_spark.graph.sssp import bfs_levels

    e = edges.select("src_id", "dst_id").filter(F.col("src_id") != F.col("dst_id"))
    if undirected:
        e = e.unionByName(
            e.select(
                F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
            )
        ).distinct()
    deg = e.groupBy("src_id").agg(F.count("*").alias("d"))
    start = int(
        deg.orderBy(F.desc("d"), F.asc("src_id")).limit(1).collect()[0]["src_id"]
    )
    d1 = bfs_levels(e, [start], max_rounds=max_rounds)
    far_row = d1.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    far, ecc_start = int(far_row["id"]), int(far_row["dist"])
    # second sweep: same graph when symmetric; the REVERSE graph when
    # directed (backward BFS from the farthest vertex u yields
    # max_v d(v→u) ≤ diameter — the standard directed double sweep; a
    # forward sweep from a sink would bound nothing)
    e2 = (
        e
        if undirected
        else e.select(
            F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
        )
    )
    d2 = bfs_levels(e2, [far], max_rounds=max_rounds)
    lb = int(d2.agg(F.max("dist")).collect()[0][0])
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(start, ecc_start, far, lb)],
        "start_id long, ecc_start long, far_id long, diameter_lb long",
    )


def concentration_profile(
    scores: DataFrame,
    score_col: str = "score",
    id_col: str = "id",
) -> DataFrame:
    """One row (n, gini_r, top1pct_share_r, top10pct_share_r) — inequality
    of a non-negative per-vertex quantity (degree, PageRank mass, crawl
    budget): the Gini coefficient plus the share held by the top 1% / 10%.

    The standard webgraph concentration summary (rank mass and in-degree
    are famously Zipf-concentrated; a sudden Gini shift between crawls
    flags spam farms or extraction regressions — pairs with
    ``operators/drift.py`` and :func:`powerlaw_alpha`).

    Gini via the sorted-index identity ``G = 2·Σ i·x_(i) / (n·Σx)
    − (n+1)/n`` with ascending index ``i = n − pos`` taken from the
    range-partitioned two-pass ranker (:func:`amanogawa_spark.graph.
    rankcorr.rank_positions` — no single-partition window, no driver-side
    value collect; the only driver scalar is ``n``).
    """
    import math

    from amanogawa_spark.graph.rankcorr import rank_positions

    vals = scores.select(
        F.col(id_col).alias("id"), F.col(score_col).cast("double").alias("x")
    )
    pos = rank_positions(vals, "x", "id")
    j = vals.join(pos, "id")
    n = j.count()
    if n == 0:
        return scores.sparkSession.createDataFrame(
            [(0, float("nan"), float("nan"), float("nan"))],
            "n long, gini_r double, top1pct_share_r double, top10pct_share_r double",
        )
    k1 = math.ceil(0.01 * float(n))
    k10 = math.ceil(0.10 * float(n))
    nf = float(n)
    agg = j.agg(
        F.sum("x").alias("tot"),
        F.sum((F.lit(nf) - F.col("pos")) * F.col("x")).alias("s"),
        F.sum(F.when(F.col("pos") < F.lit(k1), F.col("x")).otherwise(0.0)).alias("s1"),
        F.sum(F.when(F.col("pos") < F.lit(k10), F.col("x")).otherwise(0.0)).alias("s10"),
    )
    return agg.select(
        F.lit(n).cast("long").alias("n"),
        F.round(
            F.lit(2.0) * F.col("s") / (F.lit(nf) * F.col("tot"))
            - (F.lit(nf) + F.lit(1.0)) / F.lit(nf),
            8,
        ).alias("gini_r"),
        F.round(F.col("s1") / F.col("tot"), 8).alias("top1pct_share_r"),
        F.round(F.col("s10") / F.col("tot"), 8).alias("top10pct_share_r"),
    )
