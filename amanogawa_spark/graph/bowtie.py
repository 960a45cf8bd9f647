"""Bowtie decomposition — the Broder et al. macro-structure of the web.

The directed web graph decomposes into a giant strongly connected CORE,
an IN set (pages that reach the core but are not reached from it — new
or poorly-linked pages), an OUT set (reached from the core but not
reaching back — leaf content, terms-of-service trees), TENDRILS hanging
off IN or into OUT without touching the core, TUBES (IN→OUT paths that
bypass the core), and DISCONNECTED islands.  ["Graph structure in the
web", Broder et al., WWW 2000.]  The reference engine's graph surface
(amanogawa `to_graph`, graph.h) emits the edge table this consumes; the
decomposition itself is the canonical first analysis a crawl operator
runs on it — crawl scheduling (IN is where discovery happens), spam
analysis (anomalous OUT growth), and PageRank sanity (dangling mass
lives in OUT/TENDRILS) all read these regions.

Scale shape: one SCC run (FW-BW-Trim, ``graph/scc.py``) + four
frontier-BFS fixpoints.  Each BFS round shuffles only the FRONTIER
(vertices newly reached last round) against the edge table — on a
bowtie graph the frontier collapses geometrically, so total work is
O(E · diameter_of_region) with per-round cost proportional to the
frontier, not to V.  No driver-side state beyond the 1-row giant-SCC
lookup and per-round frontier counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# region labels, in classification priority order
CORE = "CORE"
IN = "IN"
OUT = "OUT"
TUBE = "TUBE"
TENDRIL_IN = "TENDRIL_IN"
TENDRIL_OUT = "TENDRIL_OUT"
DISCONNECTED = "DISCONNECTED"


def _reachable_from(
    seeds: DataFrame,
    edges: DataFrame,
    src: str = "src_id",
    dst: str = "dst_id",
    max_rounds: int = 10_000,
) -> DataFrame:
    """(id) — every vertex with a directed path FROM some seed (seeds
    included).  Frontier BFS: each round expands only the newly-reached
    set, so a round's join input is the frontier, not the full reached
    set; an empty frontier is the fixpoint.  Reversing src/dst gives
    backward reachability.
    """
    reached = seeds.select("id").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    frontier = reached
    own_frontier = False  # first frontier aliases `reached`
    for _ in range(max_rounds):
        nxt = (
            edges.join(
                frontier.select(F.col("id").alias(src)).hint("shuffle_hash"), src
            )
            .select(F.col(dst).alias("id"))
            .distinct()
            .join(reached, "id", "left_anti")
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_new = nxt.count()
        if own_frontier:
            frontier.unpersist()
        if n_new == 0:
            nxt.unpersist()
            break
        grown = (
            reached.unionAll(nxt)
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        grown.count()  # materialize before releasing the predecessor
        reached.unpersist()
        reached, frontier, own_frontier = grown, nxt, True
    return reached


def giant_scc(scc: DataFrame) -> int:
    """The label of the largest strong component (ties → smallest label).

    One groupBy over the (id, scc) table + a 1-row driver lookup.
    """
    row = (
        scc.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError("bowtie: empty SCC table")
    return row[0]["scc"]


def bowtie_decomposition(
    vertices: DataFrame,
    edges: DataFrame,
    scc: DataFrame | None = None,
) -> DataFrame:
    """(id, region) — Broder bowtie region of every vertex.

    ``scc`` may be passed in (id, scc) to reuse an existing run;
    otherwise :func:`strongly_connected_components` computes it.

    Classification (each vertex gets exactly one region):
      CORE          member of the giant SCC
      IN            reaches CORE, not in it
      OUT           reached from CORE, not in it
      TUBE          on an IN→OUT path that avoids CORE
      TENDRIL_IN    reachable from IN avoiding CORE (and not TUBE/OUT)
      TENDRIL_OUT   reaches OUT avoiding CORE (and not TUBE/IN)
      DISCONNECTED  none of the above

    IN∩OUT = ∅ by construction: a vertex both reaching and reached from
    the core is strongly connected to it, hence in CORE.
    """
    from amanogawa_spark.graph.scc import strongly_connected_components

    verts = vertices.select("id").distinct()
    e = (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if scc is None:
        scc = strongly_connected_components(verts, e)
    core_id = giant_scc(scc)
    core = (
        scc.filter(F.col("scc") == F.lit(core_id))
        .select("id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    core.count()

    # forward / backward closure of the core (core included in both)
    fwd = _reachable_from(core, e)
    bwd = _reachable_from(core, e, src="dst_id", dst="src_id")
    in_set = bwd.join(core, "id", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
    out_set = fwd.join(core, "id", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)

    # the core-avoiding subgraph: tendril/tube paths may not touch CORE
    e2 = (
        e.join(core.select(F.col("id").alias("src_id")), "src_id", "left_anti")
        .join(core.select(F.col("id").alias("dst_id")), "dst_id", "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t_fwd = _reachable_from(in_set, e2)  # reachable from IN, core-free
    t_bwd = _reachable_from(out_set, e2, src="dst_id", dst="src_id")

    regions = (
        verts.join(core.withColumn("_core", F.lit(True)), "id", "left")
        .join(in_set.select("id", F.lit(True).alias("_in")), "id", "left")
        .join(out_set.select("id", F.lit(True).alias("_out")), "id", "left")
        .join(t_fwd.select("id", F.lit(True).alias("_tf")), "id", "left")
        .join(t_bwd.select("id", F.lit(True).alias("_tb")), "id", "left")
        .select(
            "id",
            F.when(F.col("_core"), CORE)
            .when(F.col("_in"), IN)
            .when(F.col("_out"), OUT)
            .when(F.col("_tf") & F.col("_tb"), TUBE)
            .when(F.col("_tf"), TENDRIL_IN)
            .when(F.col("_tb"), TENDRIL_OUT)
            .otherwise(DISCONNECTED)
            .alias("region"),
        )
    )
    out = regions.localCheckpoint(eager=True)
    for h in (e, core, in_set, out_set, e2, fwd, bwd, t_fwd, t_bwd):
        h.unpersist()
    return out


def bowtie_summary(regions: DataFrame) -> DataFrame:
    """(region, n_vertices, frac) — the classic bowtie size table."""
    counts = regions.groupBy("region").agg(F.count("*").alias("n_vertices"))
    # 1-row total via crossJoin — an unpartitioned Window would funnel the
    # counts through a single-partition Exchange (harmless at ≤7 rows but
    # a wrong habit to model)
    total = counts.agg(F.sum("n_vertices").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "region",
        "n_vertices",
        F.round(F.col("n_vertices") / F.col("_total"), 8).alias("frac"),
    )
