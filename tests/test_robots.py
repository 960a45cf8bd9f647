"""Robots-exclusion filtering (functions/robots.py): RFC 9309
longest-match, allow-wins-ties, no-rules-means-allowed."""

from __future__ import annotations

from amanogawa_spark.functions.robots import robots_decisions, robots_filter


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def _rules(spark, rows):
    return spark.createDataFrame(rows, ["host", "pattern", "allow"])


def test_longest_match_wins(spark):
    u = _urls(spark, ["http://a.com/private/public/x", "http://a.com/private/y"])
    r = _rules(
        spark,
        [("a.com", "/private/", False), ("a.com", "/private/public/", True)],
    )
    got = {x["url"]: (x["allowed"], x["rule_pattern"]) for x in robots_decisions(u, r).collect()}
    assert got["http://a.com/private/public/x"] == (True, "/private/public/")
    assert got["http://a.com/private/y"] == (False, "/private/")


def test_allow_wins_length_tie(spark):
    u = _urls(spark, ["http://a.com/dir/x"])
    r = _rules(spark, [("a.com", "/dir/", False), ("a.com", "/dir/", True)])
    got = robots_decisions(u, r).collect()[0]
    assert got["allowed"] is True


def test_no_rules_host_allowed(spark):
    u = _urls(spark, ["http://norules.com/anything"])
    r = _rules(spark, [("other.com", "/", False)])
    got = robots_decisions(u, r).collect()[0]
    assert got["allowed"] is True and got["rule_pattern"] is None


def test_catch_all_disallow(spark):
    u = _urls(spark, ["http://b.com/x", "http://b.com/ok/y"])
    r = _rules(spark, [("b.com", "/", False), ("b.com", "/ok/", True)])
    got = {x["url"]: x["allowed"] for x in robots_decisions(u, r).collect()}
    assert got == {"http://b.com/x": False, "http://b.com/ok/y": True}


def test_filter_keeps_caller_columns(spark):
    u = spark.createDataFrame(
        [("http://a.com/private/x", 7), ("http://a.com/open/y", 8)],
        ["url", "payload"],
    )
    r = _rules(spark, [("a.com", "/private/", False)])
    rows = robots_filter(u, r).collect()
    assert [(x["url"], x["payload"]) for x in rows] == [("http://a.com/open/y", 8)]


def test_host_case_insensitive(spark):
    u = _urls(spark, ["http://A.COM/private/x"])
    r = _rules(spark, [("a.com", "/private/", False)])
    assert robots_decisions(u, r).collect()[0]["allowed"] is False


def test_path_prefixes_and_sitemap_rollup(spark):
    from pyspark.sql import functions as F

    from amanogawa_spark.functions.url import path_prefixes, sitemap_rollup

    u = spark.createDataFrame(
        [
            ("http://a.com/x/y/z/deep", 2.0),
            ("http://a.com/x/q", 1.0),
            ("http://a.com", 5.0),
            ("http://b.com/solo", 1.0),
        ],
        ["url", "score"],
    )
    # prefixes capped at depth 2
    got = u.select(path_prefixes(F.col("url"), 2).alias("p")).collect()
    assert got[0]["p"] == ["/x", "/x/y"]
    assert got[2]["p"] == []  # empty path → no prefixes

    roll = {
        (r["host"], r["prefix"]): (r["depth"], r["n_urls"], r["weight"])
        for r in sitemap_rollup(u, weight_col="score", max_depth=2).collect()
    }
    assert roll[("a.com", "/x")] == (1, 2, 3.0)
    assert roll[("a.com", "/x/y")] == (2, 1, 2.0)
    assert roll[("a.com", "/")] == (0, 1, 5.0)  # pathless url
    assert roll[("b.com", "/solo")] == (1, 1, 1.0)


def test_sitemap_directives_from_robots_txt(spark):
    from amanogawa_spark.functions.robots import sitemap_directives

    body = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://a.com/sitemap.xml\n"
        "  sitemap:   http://a.com/sitemap2.xml\n"
        "# Sitemap: http://commented.out/x\n"
    )
    df = spark.createDataFrame([(body,)], "txt string")
    got = df.select(sitemap_directives("txt").alias("s")).collect()[0]["s"]
    assert got == ["http://a.com/sitemap.xml", "http://a.com/sitemap2.xml"]


def test_parse_sitemap_urlset_and_index(spark):
    from amanogawa_spark.functions.robots import parse_sitemap

    urlset = (
        "<urlset><url><loc>http://a.com/1</loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        "<url><loc>\n  http://a.com/2 </loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://a.com/s2.xml</loc>"
        "<lastmod>2025-12-31</lastmod></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame([(1, urlset), (2, index)], "id long, xml string")
    got = {
        r["id"]: [(e["loc"], e["lastmod"]) for e in r["e"]]
        for r in df.select("id", parse_sitemap("xml").alias("e")).collect()
    }
    assert got[1] == [("http://a.com/1", "2026-01-02"), ("http://a.com/2", "")]
    assert got[2] == [("http://a.com/s1.xml", ""), ("http://a.com/s2.xml", "2025-12-31")]
