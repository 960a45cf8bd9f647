"""SCC condensation DAG and topological (longest-path) levels.

The web graph's macro-structure analyses (bowtie, frontier scheduling,
incremental recrawl ordering) all consume the CONDENSATION: contract
every strongly connected component (reference `amanogawa`'s directed
link graph, our :mod:`amanogawa_spark.graph.scc`) to a single
super-vertex and keep the distinct inter-component edges.  The result is
a DAG by construction, so it admits topological levels — here the
LONGEST-path-from-any-source level, the natural parallel-schedule depth:
every super-vertex at level L depends only on levels < L, so level
buckets are exactly the waves a staged recrawl / propagation job can
execute concurrently.

Scale shape:

* :func:`condensation_edges` is one broadcast-or-shuffle equi-join per
  endpoint (the component map is a skinny (id, scc) frame) plus a
  distinct — the same shape as the edge-canonicalization step of
  :mod:`amanogawa_spark.graph.build`.
* :func:`topological_levels` is Bellman–Ford-style max-propagation over
  the CONDENSATION edges (orders of magnitude smaller than the raw edge
  table on a real web graph — the giant SCC collapses to one row).
  Each round is one join + one map-side-combined max aggregate; the
  round count is the DAG depth, with an early-exit fixpoint probe.
  Levels are integers, so there is no float-portability concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def condensation_edges(edges: DataFrame, comp: DataFrame) -> DataFrame:
    """Distinct super-edges (src_scc, dst_scc) of the condensation.

    ``edges`` is the directed (src_id, dst_id) table; ``comp`` maps
    (id, scc) — :func:`strongly_connected_components` output.  Intra-SCC
    edges contract away (filtered); the result is acyclic by the SCC
    definition.
    """
    c_src = comp.select(F.col("id").alias("src_id"), F.col("scc").alias("src_scc"))
    c_dst = comp.select(F.col("id").alias("dst_id"), F.col("scc").alias("dst_scc"))
    return (
        edges.join(c_src, "src_id")
        .join(c_dst, "dst_id")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )


def topological_levels(
    cedges: DataFrame,
    comp: DataFrame,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """(scc, n_members, level): longest-path-from-source level per SCC.

    ``level`` is the length of the longest directed path in the
    condensation ending at the super-vertex; sources (no in-edges) sit at
    level 0.  Computed by synchronous max-propagation: L_{k+1}(v) =
    max(L_k(v), 1 + max over in-edges (u,v) of L_k(u)), which converges
    to the longest-path level after depth(DAG) rounds.  ``fixed_rounds``
    runs exactly that many rounds with no driver-side convergence probe
    (the oracle-friendly variant); otherwise the loop stops as soon as a
    round changes nothing, or at ``max_rounds`` (a cycle — impossible on
    a true condensation — would otherwise loop forever).
    """
    sizes = comp.groupBy("scc").agg(F.count("*").alias("n_members"))
    levels = sizes.select("scc", F.lit(0).cast("long").alias("level"))
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    check_fixpoint = fixed_rounds is None

    for _ in range(rounds):
        cand = (
            cedges.join(
                levels.select(F.col("scc").alias("src_scc"), "level"), "src_scc"
            )
            .groupBy(F.col("dst_scc").alias("scc"))
            .agg((F.max("level") + F.lit(1)).alias("cand"))
        )
        nxt = (
            levels.join(cand, "scc", "left")
            .select(
                "scc",
                F.greatest("level", F.coalesce("cand", F.lit(0))).alias("level"),
            )
            .localCheckpoint(eager=True)
        )
        if check_fixpoint:
            changed = (
                nxt.join(levels.withColumnRenamed("level", "old"), "scc")
                .filter(F.col("level") != F.col("old"))
                .limit(1)
                .count()
            )
            levels = nxt
            if changed == 0:
                break
        else:
            levels = nxt

    return sizes.join(levels, "scc").select("scc", "n_members", "level")
