"""Spectral graph analysis: Fiedler vector via deflated power iteration
and spectral bisection.

The Fiedler vector (second eigenvector of the normalized Laplacian
L = I − D^{-1/2} A D^{-1/2}) orders vertices along the graph's dominant
"cut direction"; splitting at the median yields the classic spectral
bisection, the textbook quality yardstick for partitioners (Spinner /
multilevel in ``graph/partition.py``).

Formulation that survives 10^12 vertices:

- Work with the SHIFTED normalized adjacency  M' = (I + D^{-1/2} A
  D^{-1/2}) / 2, whose spectrum lies in [0, 1] with the same
  eigenvectors as L (order reversed). Its top eigenvector is the known
  closed form u1 ∝ D^{1/2}·1, so the second-largest — the Fiedler
  vector — is reachable by power iteration with DEFLATION against u1
  (M' is symmetric, so exact arithmetic preserves orthogonality; we
  re-project every round to stop float drift re-growing the u1
  component at rate λ1/λ2).
- One matvec per round = the PageRank join shape: normalized edge
  weights  w/√(d_u d_v)  are materialized ONCE and persisted, each
  round is edge ⋈ x on the same hash key + a map-side-combined sum.
- Per-round rescaling divides by max|x| — an order-insensitive
  aggregate (no float-summation nondeterminism), so fixed-iteration
  runs are bit-reproducible across partitionings, which is what lets
  the DuckDB oracle mirror the loop exactly.
- Scalar deflation/rescale coefficients are O(1) driver collects on a
  checkpointed frame (the pagerank dangling-mass pattern) — nothing
  O(V) ever reaches the driver.

Scale notes: per round 1 shuffle (the matvec aggregate) + 2 broadcast
scalar attaches; lineage is truncated by an eager ``localCheckpoint`` every round (the
scalar actions then read a materialized frame), as in
``graph/pagerank.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _norm_adjacency(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """(u, v, nw) with nw = w / sqrt(d_u * d_v) over the symmetrized
    simple graph; d = weighted degree. Both directions present."""
    if weight_col is None:
        fwd = edges.select(F.col("src_id").alias("u"), F.col("dst_id").alias("v"))
        sym = (
            fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .select("u", "v", F.lit(1.0).alias("w"))
        )
    else:
        e = edges.filter(F.col("src_id") != F.col("dst_id"))
        fwd = e.select(
            F.col("src_id").alias("u"),
            F.col("dst_id").alias("v"),
            F.col(weight_col).cast("double").alias("w"),
        )
        sym = (
            fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
        )
    deg = sym.groupBy("u").agg(F.sum("w").alias("d"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    return (
        sym.join(deg, "u")
        .join(dv, "v")
        .select("u", "v", (F.col("w") / F.sqrt(F.col("d") * F.col("dv"))).alias("nw"))
    )


def fiedler_vector(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 40,
    weight_col: str | None = None,
    adaptive: bool = False,
) -> DataFrame:
    """(id, f) — the Fiedler coordinate per vertex, scaled so max|f| = 1.

    Deterministic init (md5 of the id, centered), then ``iterations``
    rounds of  x ← rescale(deflate(M'x)).  Isolated vertices (degree 0)
    get f = 0. Sign is pinned by the deterministic init + fixed round
    count; convergence to the true eigenvector is pinned against
    numpy.linalg.eigh in tests/test_spectral.py.
    """
    from amanogawa_spark.graph.iter_conf import iteration_conf

    spark = vertices.sparkSession
    with iteration_conf(spark, disable_aqe=not adaptive):
        return _fiedler_loop(vertices, edges, iterations, weight_col)


def _fiedler_loop(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int,
    weight_col: str | None,
) -> DataFrame:
    adj = _norm_adjacency(edges, weight_col).persist(StorageLevel.MEMORY_AND_DISK)
    # u1 ∝ sqrt(d) with d the weighted degree in the ORIGINAL adjacency:
    # the known top eigenvector of M' (un-normalized is fine — deflation
    # uses the ratio (u1·x)/(u1·u1), which is scale-free)
    if weight_col is None:
        fwd = edges.select(F.col("src_id").alias("u"), F.col("dst_id").alias("v"))
        sym = (
            fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        degw = sym.groupBy("u").agg(F.count("*").cast("double").alias("d"))
    else:
        e = edges.filter(F.col("src_id") != F.col("dst_id"))
        fwd = e.select(
            F.col("src_id").alias("u"),
            F.col("dst_id").alias("v"),
            F.col(weight_col).cast("double").alias("w"),
        )
        degw = (
            fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
            .groupBy("u")
            .agg(F.sum("w").alias("d"))
        )
    base = (
        vertices.select("id")
        .join(degw.select(F.col("u").alias("id"), "d"), "id", "left")
        .select("id", F.coalesce("d", F.lit(0.0)).alias("d"))
        .withColumn("u1", F.sqrt("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # deterministic centered init on non-isolated vertices
    h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    x = base.select(
        "id",
        "u1",
        F.when(F.col("d") > 0, (h % 1000).cast("double") / 500.0 - 1.0)
        .otherwise(F.lit(0.0))
        .alias("x"),
    )

    def _deflate_rescale(frame: DataFrame) -> DataFrame:
        """Scalar coefficients ride DRIVER actions on the (checkpointed)
        frame — the pagerank dangling-mass pattern. A broadcast-join
        formulation re-evaluates the whole segment lineage inside every
        broadcast subplan and the plan fans out 3× per round; two O(1)
        collect()s on a materialized frame stay linear."""
        s = frame.agg(
            F.sum(F.col("u1") * F.col("x")).alias("ux"),
            F.sum(F.col("u1") * F.col("u1")).alias("uu"),
        ).collect()[0]
        c = (s["ux"] / s["uu"]) if (s["uu"] or 0.0) > 0 else 0.0
        d = frame.select(
            "id", "u1", (F.col("x") - F.lit(float(c)) * F.col("u1")).alias("x")
        )
        mx = d.agg(F.max(F.abs(F.col("x"))).alias("mx")).collect()[0]["mx"]
        if not mx or mx <= 0:
            return d
        return d.select(
            "id", "u1", (F.col("x") / F.lit(float(mx))).alias("x")
        )

    x = _deflate_rescale(x.localCheckpoint(eager=True))
    for it in range(1, iterations + 1):
        xv = x.select(F.col("id").alias("v"), F.col("x").alias("xv"))
        mv = (
            adj.join(xv, "v")
            .groupBy("u")
            .agg(F.sum(F.col("nw") * F.col("xv")).alias("ax"))
        )
        nxt = (
            x.join(mv.select(F.col("u").alias("id"), "ax"), "id", "left")
            .select(
                "id",
                "u1",
                ((F.col("x") + F.coalesce("ax", F.lit(0.0))) / 2.0).alias("x"),
            )
        )
        # truncate lineage BEFORE the scalar actions so each collect reads
        # a materialized frame instead of replaying the segment
        nxt = nxt.localCheckpoint(eager=True)
        x = _deflate_rescale(nxt)
    out = x.select("id", F.col("x").alias("f"))
    adj.unpersist()
    base.unpersist()
    return out


def spectral_bisection(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 40,
    weight_col: str | None = None,
) -> DataFrame:
    """(id, side) — balanced two-way split at the MEDIAN Fiedler
    coordinate (side 0 = below-or-at median; exact tie handling via
    rank so the split is always ⌈n/2⌉/⌊n/2⌋ regardless of ties).
    The median rank pass reuses the range-partitioned percentile
    machinery (no single-partition window)."""
    f = fiedler_vector(vertices, edges, iterations, weight_col)
    # median via approx-free percentile over a numeric column: exact
    # percentile on the driver is O(1) rows (percentile returns a scalar)
    med = f.agg(F.expr("percentile(f, 0.5)").alias("m"))
    ranked = f.join(F.broadcast(med)).select(
        "id",
        "f",
        F.when(
            (F.col("f") < F.col("m"))
            | ((F.col("f") == F.col("m")) & (F.col("id") % 2 == 0)),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("side"),
    )
    return ranked.select("id", "side")


def bisection_cut_summary(
    edges: DataFrame, sides: DataFrame
) -> DataFrame:
    """One row (cut_edges, total_edges, cut_frac, size_0, size_1) scoring
    a 2-way partition — the comparison row for spectral vs spinner vs
    random on the same graph."""
    s_src = sides.select(F.col("id").alias("src_id"), F.col("side").alias("_s0"))
    s_dst = sides.select(F.col("id").alias("dst_id"), F.col("side").alias("_s1"))
    und = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("src_id"),
            F.greatest("src_id", "dst_id").alias("dst_id"),
        )
        .distinct()
    )
    j = und.join(s_src, "src_id").join(s_dst, "dst_id")
    stats = j.agg(
        F.sum(F.when(F.col("_s0") != F.col("_s1"), 1).otherwise(0))
        .cast("long")
        .alias("cut_edges"),
        F.count("*").alias("total_edges"),
    )
    sizes = sides.groupBy().agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("long").alias("size_0"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("size_1"),
    )
    return stats.crossJoin(sizes).select(
        "cut_edges",
        "total_edges",
        (F.col("cut_edges") / F.greatest(F.col("total_edges"), F.lit(1))).alias(
            "cut_frac"
        ),
        "size_0",
        "size_1",
    )
