"""Anchor-text aggregation: what the web says a page is about.

Search-engine-style enrichment of the link graph: every ``<a href>`` link
carries a human-written label (its anchor text); aggregating those labels
per *target* page yields a description of the page written by everyone who
links to it — the classic web-IR signal (anchor text famously describes a
page better than the page itself, and is the only text available for pages
that were linked but never crawled).

Reference anchor: the reference's ``flow.to_graph`` emits bare edges only
(``plugin/flow/to_graph/to_graph.cpp:174-196`` — src/dst pairs, meta
passthrough); anchor labels are an engine addition the link-graph mission
needs (north-rule: Common-Crawl-style page processing).

Scale design (100 TB):

- extraction (``extract_anchors``) is an Arrow-batched map over the scan —
  no shuffle, linear in HTML bytes;
- id resolution is the same two shuffle-hash joins as ``build_edges``;
- term aggregation is explode + ONE map-side-combined ``groupBy(dst_id,
  term)`` count. Crucially the top-k window runs over the *aggregated*
  (dst_id, term) rows, never the raw inlinks: a hub page with 10^9 inlinks
  contributes only its distinct-term rows (bounded by label vocabulary, in
  practice tiny) to the window partition, so hub skew is absorbed by the
  map-side combine, not the window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.functions.html import extract_anchors


def anchor_pairs_urls(pages: DataFrame, normalize: bool = False) -> DataFrame:
    """pages(url, html) → (src_url, dst_url, anchor), one row per link.

    Keeps multiplicity (the same link twice = two votes) and drops
    self-links, mirroring :func:`~amanogawa_spark.graph.build.extract_edges_urls`
    except that labeled links are NOT deduped — each occurrence is a vote.
    """
    pairs = pages.select(
        F.col("url").alias("src_url"),
        F.explode(extract_anchors("html")).alias("a"),
    ).select(
        "src_url", F.col("a.href").alias("dst_url"), F.col("a.anchor").alias("anchor")
    )
    if normalize:
        from amanogawa_spark.functions.url import normalize_url

        pairs = pairs.select(
            normalize_url(F.col("src_url")).alias("src_url"),
            normalize_url(F.col("dst_url")).alias("dst_url"),
            "anchor",
        )
    return pairs.filter(F.col("src_url") != F.col("dst_url"))


def anchor_edges(
    pages: DataFrame, vertices: DataFrame, broadcast_vertices: bool = False,
    normalize: bool = False,
) -> DataFrame:
    """(src_id, dst_id, anchor) — labeled edges resolved through the url
    dictionary; links to unknown urls are dropped (same contract as
    ``build_edges``)."""
    vsrc = vertices.select(F.col("url").alias("src_url"), F.col("id").alias("src_id"))
    vdst = vertices.select(F.col("url").alias("dst_url"), F.col("id").alias("dst_id"))
    if broadcast_vertices:
        vsrc, vdst = F.broadcast(vsrc), F.broadcast(vdst)
    return (
        anchor_pairs_urls(pages, normalize=normalize)
        .join(vsrc, "src_url")
        .join(vdst, "dst_url")
        .select("src_id", "dst_id", "anchor")
    )


def anchor_term_counts(labeled_edges: DataFrame) -> DataFrame:
    """(dst_id, term, cnt): whitespace-tokenized, lowercased anchor terms
    aggregated over all inlinks of each target. One shuffle (the groupBy);
    partial aggregation happens map-side, so hub in-degree never travels."""
    toks = F.explode(
        F.split(F.lower(F.regexp_replace(F.trim(F.col("anchor")), r"\s+", " ")), " ")
    ).alias("term")
    return (
        labeled_edges.select("dst_id", toks)
        .filter(F.length("term") > 0)
        .groupBy("dst_id", "term")
        .agg(F.count("*").alias("cnt"))
    )


def anchor_top_terms(labeled_edges: DataFrame, k: int = 3) -> DataFrame:
    """Per-target top-k anchor terms: (dst_id, term, cnt, rank).

    Deterministic order: cnt desc, term asc — ties always break the same
    way on every engine. The window sees only aggregated (dst_id, term)
    rows (see module docstring), so it survives hub skew.
    """
    counts = anchor_term_counts(labeled_edges)
    w = Window.partitionBy("dst_id").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dst_id", "term", "cnt", "rank")
    )
