"""Co-citation and bibliographic coupling over the directed link graph.

The two classic directed-webgraph relatedness measures (Small 1973 /
Kessler 1963, popularized for the web by Dean & Henzinger's related-pages
work): two pages are *co-cited* when a third page links to both, and
*bibliographically coupled* when they link to a common target. Unlike the
undirected common-neighbor family in
:mod:`amanogawa_spark.graph.linkpred`, these respect edge direction —
they are the primitives behind "related pages" / "similar hosts" on a
crawl graph. The reference stops at kNN graph construction
(``to_graph/to_graph.cpp:88-117``); this extends §2 like k-core/HITS did.

Scale shape: each measure is ONE self-join of the edge table through the
shared endpoint. A source with out-degree d contributes d(d-1)/2
co-citation pairs (resp. in-degree for coupling), so hub pages blow the
join up quadratically — the guard is ``max_degree``, which drops
wedge *intermediates* above the cap before the join (navigation mega-hubs
carry the least relatedness signal per pair; same policy as
``link_prediction_scores``). With the cap the join is bounded by
Σ min(d, cap)² = O(cap·|E|). Both measures are map-side-combinable
aggregates after the join — no driver-side work, fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _paired_through(
    edges: DataFrame,
    pivot: str,
    other: str,
    max_degree: int | None,
    min_count: int,
    k: int | None,
    count_name: str,
) -> DataFrame:
    """Pairs of ``other``-endpoints sharing a ``pivot`` endpoint, with the
    number of distinct shared pivots. Canonicalized id_a < id_b."""
    e = edges.filter(F.col("src_id") != F.col("dst_id")).select(pivot, other).distinct()
    if max_degree is not None:
        keep = (
            e.groupBy(pivot)
            .agg(F.count("*").alias("_d"))
            .filter(F.col("_d") <= max_degree)
            .select(pivot)
        )
        e = e.join(keep, pivot, "semi")
    left = e.select(F.col(pivot).alias("p"), F.col(other).alias("id_a"))
    right = e.select(F.col(pivot).alias("p"), F.col(other).alias("id_b"))
    pairs = (
        left.join(right, "p")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias(count_name))
        .filter(F.col(count_name) >= min_count)
    )
    if k is not None:
        pairs = pairs.orderBy(
            F.col(count_name).desc(), F.col("id_a").asc(), F.col("id_b").asc()
        ).limit(k)
    return pairs


def cocitation(
    edges: DataFrame,
    *,
    min_count: int = 2,
    max_out_degree: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """(id_a < id_b, cocite) — number of distinct pages linking to BOTH.

    ``max_out_degree`` drops citing pages above the cap before the
    self-join (the quadratic-blowup guard); ``k`` returns only the top-k
    pairs by count (ties broken by ascending ids — deterministic).
    """
    return _paired_through(
        edges, "src_id", "dst_id", max_out_degree, min_count, k, "cocite"
    )


def bibliographic_coupling(
    edges: DataFrame,
    *,
    min_count: int = 2,
    max_in_degree: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """(id_a < id_b, coupling) — number of distinct common link targets.

    ``max_in_degree`` drops shared *targets* above the cap (a page linked
    by everyone — a footer home link — relates nothing)."""
    return _paired_through(
        edges, "dst_id", "src_id", max_in_degree, min_count, k, "coupling"
    )
