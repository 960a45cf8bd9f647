"""Crawl frontier prioritization: what to fetch next, politely.

Closes the crawl loop the engine's other halves assume (WARC ingestion
brings pages in, the link graph ranks them): the frontier is every linked
URL the crawl has not fetched, prioritized by the PageRank mass flowing
into it from crawled pages (each crawled source donates rank/outdeg along
its links — exactly the dangling contribution the next PageRank iteration
would credit), and emitted top-k per host so no single host's fetch queue
floods a polite crawler.

Scale: frontier detection is one left-anti join against the crawled key
set; priority is one map-side-combined sum over the link table; the
politeness cut is a per-host window over the aggregated frontier rows
(bounded by distinct frontier URLs per host, not by in-link volume —
same hub-absorption argument as anchors.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def frontier_priorities(
    links: DataFrame, crawled: DataFrame, ranks: DataFrame | None = None
) -> DataFrame:
    """(dst, mass): rank mass flowing to each un-crawled link target.

    ``links``: (src, dst) — any key type; ``crawled``: (key) fetched set;
    ``ranks``: (key, rank) for crawled sources (uniform 1.0 when None).
    mass(dst) = Σ_{src→dst, src crawled} rank(src) / outdeg(src).
    A crawled source MISSING from ``ranks`` contributes the uniform
    default 1.0 rather than silently dropping out — a partially-populated
    rank table (e.g. mid-refresh) must not zero whole frontier regions.
    """
    src_keyed = links.select(F.col("src").alias("key"), "dst")
    crawled_keys = crawled.select(F.col(crawled.columns[0]).alias("key")).distinct()
    from_crawled = src_keyed.join(crawled_keys, "key", "left_semi")
    outdeg = from_crawled.groupBy("key").agg(F.count("*").alias("od"))
    if ranks is None:
        r = outdeg.select("key", F.lit(1.0).alias("rank"), "od")
    else:
        r = outdeg.join(
            ranks.select(F.col(ranks.columns[0]).alias("key"), F.col(ranks.columns[1]).alias("rank")),
            "key",
            "left",
        ).select("key", F.coalesce("rank", F.lit(1.0)).alias("rank"), "od")
    contrib = from_crawled.join(r, "key").select(
        "dst", (F.col("rank") / F.col("od")).alias("w")
    )
    frontier = contrib.join(
        crawled_keys.select(F.col("key").alias("dst")), "dst", "left_anti"
    )
    return frontier.groupBy("dst").agg(F.sum("w").alias("mass"))


def polite_topk(
    priorities: DataFrame, host: Column, k: int = 10, round_to: int = 8
) -> DataFrame:
    """(host, dst, mass_r, rank): top-k frontier targets per host by
    (rounded mass desc, dst asc) — rounded before ranking so the order is
    engine-stable."""
    w = Window.partitionBy("host").orderBy(F.desc("mass_r"), F.asc("dst"))
    return (
        priorities.select(
            host.alias("host"), "dst", F.round("mass", round_to).alias("mass_r")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def crawl_frontier(
    pages: DataFrame, ranks_by_url: DataFrame | None = None, per_host: int = 10
) -> DataFrame:
    """URL-level wrapper: extract links from the crawled pages' HTML, find
    un-crawled targets, prioritize by donated rank mass, cut top
    ``per_host`` per registered host. Returns (host, dst, mass_r, rank)."""
    from amanogawa_spark.functions.url import host_of
    from amanogawa_spark.graph.build import extract_edges_urls

    links = extract_edges_urls(pages).select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
    )
    crawled = pages.select("url")
    pr = frontier_priorities(links, crawled, ranks_by_url)
    return polite_topk(pr, host_of(F.col("dst")), k=per_host)


def politeness_schedule(
    priorities: DataFrame,
    host: Column,
    default_delay: float = 1.0,
    delays: DataFrame | None = None,
) -> DataFrame:
    """(dst, host, slot, fetch_at) — a polite fetch timetable: one fetch
    per host at a time, spaced by the host's crawl delay.

    ``priorities``: (dst, mass) from :func:`frontier_priorities`;
    ``host``: expression deriving the host key from ``dst``;
    ``delays``: optional (host, delay) seconds table (robots.txt
    Crawl-delay per host), ``default_delay`` otherwise.

    slot(u) = position of u in its host's queue (mass DESC, dst ASC —
    deterministic), fetch_at = slot · delay.  ONE window keyed on host
    (bounded by the host's frontier size) plus an optional broadcast
    join against the per-host delay table; nothing global.
    """
    w = Window.partitionBy("host").orderBy(F.desc("mass"), F.asc("dst"))
    base = priorities.select("dst", "mass", host.alias("host")).withColumn(
        "slot", (F.row_number().over(w) - 1).cast("long")
    )
    if delays is None:
        d = base.withColumn("_delay", F.lit(float(default_delay)))
    else:
        d = base.join(
            F.broadcast(
                delays.select(
                    F.col("host"), F.col("delay").cast("double").alias("_delay")
                )
            ),
            "host",
            "left",
        ).withColumn("_delay", F.coalesce("_delay", F.lit(float(default_delay))))
    return d.select(
        "dst",
        "host",
        "slot",
        F.round(F.col("slot") * F.col("_delay"), 8).alias("fetch_at"),
    )

def crawl_budget(
    host_mass: DataFrame,
    budget: int,
    host_col: str = "host",
    mass_col: str = "mass",
) -> DataFrame:
    """(host, mass_frac, quota) — largest-remainder apportionment of a
    global crawl budget across hosts proportional to rank/link mass.
    Quotas are exact: Σ quota = ``budget``, each quota within 1 of the
    proportional share (the no-paradox apportionment crawl schedulers
    want when splitting a fetch budget across millions of hosts).

    Distributed shape: floors are a map stage; the remainder bonus needs
    the global remainder ORDER, ranked via the same two-pass
    range-partitioned ranker as the vertex dictionary
    (:func:`~amanogawa_spark.graph.build.dense_rank_ids`) — no
    single-partition window, no driver collect of hosts (the only
    collects are two scalars and the O(#partitions) offset table).
    """
    from amanogawa_spark.graph.build import dense_rank_ids

    t = float(
        host_mass.agg(F.sum(F.col(mass_col).cast("double")).alias("t"))
        .collect()[0]["t"]
    )
    df = host_mass.select(
        F.col(host_col).alias("host"), F.col(mass_col).cast("double").alias("m")
    ).withColumn("share", (F.col("m") / F.lit(t)) * budget)
    df = df.withColumn("base", F.floor("share").cast("long")).withColumn(
        "rem", F.col("share") - F.col("base")
    )
    extra = int(budget - df.agg(F.sum("base")).collect()[0][0])
    ranked = dense_rank_ids(
        df.withColumn(
            "_ord", F.struct((-F.col("rem")).alias("nr"), F.col("host"))
        ),
        "_ord",
        out_col="_rank",
    )
    out = ranked.select(
        "host",
        F.round(F.col("m") / F.lit(t), 8).alias("mass_frac"),
        (
            F.col("base")
            + F.when(F.col("_rank") < extra, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("quota"),
    )
    ranked.unpersist()
    return out
