"""Crawl frontier prioritization (graph/frontier.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.frontier import (
    crawl_frontier,
    frontier_priorities,
    polite_topk,
)


def test_frontier_mass_hand_computed(spark):
    # crawled a,b ; a links x,y (outdeg 2, rank 1) ; b links x (outdeg 1)
    links = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("z", "w")], ["src", "dst"]
    )
    crawled = spark.createDataFrame([("a",), ("b",)], ["url"])
    got = {r["dst"]: r["mass"] for r in frontier_priorities(links, crawled).collect()}
    # z is uncrawled: its link contributes nothing; w absent
    assert got == {"x": pytest.approx(1.5), "y": pytest.approx(0.5)}


def test_frontier_excludes_crawled_targets_and_uses_ranks(spark):
    links = spark.createDataFrame([("a", "b"), ("a", "x")], ["src", "dst"])
    crawled = spark.createDataFrame([("a",), ("b",)], ["url"])
    ranks = spark.createDataFrame([("a", 0.8)], ["url", "rank"])
    got = {r["dst"]: r["mass"] for r in frontier_priorities(links, crawled, ranks).collect()}
    assert got == {"x": pytest.approx(0.4)}  # b is crawled -> not frontier


def test_polite_topk_per_host(spark):
    pr = spark.createDataFrame(
        [("h1/p1", 5.0), ("h1/p2", 3.0), ("h1/p3", 1.0), ("h2/p1", 2.0)],
        ["dst", "mass"],
    )
    out = polite_topk(pr, F.split(F.col("dst"), "/")[0], k=2).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append((r["rank"], r["dst"]))
    assert sorted(by_host["h1"]) == [(1, "h1/p1"), (2, "h1/p2")]
    assert sorted(by_host["h2"]) == [(1, "h2/p1")]


def test_crawl_frontier_end_to_end_on_pages(spark):
    from amanogawa_spark.fixtures.pages import generate_pages

    corpus = generate_pages(n_pages=120, seed=7)
    pages = spark.createDataFrame(corpus.pages)
    # crawl only 80 of the 120 pages; the rest become frontier candidates
    sub = pages.orderBy("url").limit(80)
    out = crawl_frontier(sub, per_host=5)
    rows = out.collect()
    crawled_urls = {r["url"] for r in sub.select("url").collect()}
    assert all(r["dst"] not in crawled_urls for r in rows)
    # politeness: at most 5 per host, hosts parsed from the fixture urls
    per_host = {}
    for r in rows:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
        assert r["host"].endswith(".example.org")
    assert all(v <= 5 for v in per_host.values())
    assert len(rows) > 0


def test_frontier_partial_ranks_default_to_uniform(spark):
    """A crawled source missing from the ranks table contributes the uniform
    default 1.0, not silently zero (ADVICE r3: inner join dropped it)."""
    links = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("b", "y")], ["src", "dst"]
    )
    crawled = spark.createDataFrame([("a",), ("b",)], ["url"])
    ranks = spark.createDataFrame([("a", 0.8)], ["url", "rank"])  # b unranked
    got = {
        r["dst"]: r["mass"]
        for r in frontier_priorities(links, crawled, ranks).collect()
    }
    # a: rank .8 / outdeg 1 -> x ; b: default 1.0 / outdeg 2 -> x and y
    assert got == {"x": pytest.approx(1.3), "y": pytest.approx(0.5)}


def test_politeness_schedule_slots_and_delays(spark):
    from pyspark.sql import functions as F

    from amanogawa_spark.graph.frontier import politeness_schedule

    pri = spark.createDataFrame(
        [(10, 5.0), (11, 3.0), (12, 9.0), (20, 1.0)], ["dst", "mass"]
    )
    delays = spark.createDataFrame([(1, 2.0)], ["host", "delay"])
    # host = dst // 10 → {10,11,12} on host 1 (delay 2s), {20} on host 2
    got = {
        r["dst"]: (r["host"], r["slot"], r["fetch_at"])
        for r in politeness_schedule(
            pri, (F.col("dst") / 10).cast("long"), default_delay=0.5, delays=delays
        ).collect()
    }
    # host 1 queue by mass desc: 12 (slot 0), 10 (slot 1), 11 (slot 2)
    assert got[12] == (1, 0, 0.0)
    assert got[10] == (1, 1, 2.0)
    assert got[11] == (1, 2, 4.0)
    # host 2 has no delay row → default 0.5; single url at slot 0
    assert got[20] == (2, 0, 0.0)


def test_politeness_schedule_tiebreak_by_dst(spark):
    from pyspark.sql import functions as F

    from amanogawa_spark.graph.frontier import politeness_schedule

    pri = spark.createDataFrame([(3, 1.0), (1, 1.0), (2, 1.0)], ["dst", "mass"])
    got = {
        r["dst"]: r["slot"]
        for r in politeness_schedule(pri, F.lit(0)).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}
