"""URL hygiene functions: canonical-form collapsing for vertex keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.functions.url import (
    host_of,
    normalize_url,
    path_depth,
    registered_domain,
)


def test_url_functions_edge_cases(spark):
    rows = [
        (0, "HTTP://User@WWW.Example.COM:80/a/b/"),
        (1, "https://example.com:443/a#frag"),
        (2, "http://news.bbc.co.uk/x/y/z"),
        (3, "http://example.org"),
        (4, "not a url"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r.i: (r.host, r.rdom, r.depth, r.norm)
        for r in df.select(
            "i",
            host_of("url").alias("host"),
            registered_domain("url").alias("rdom"),
            path_depth("url").alias("depth"),
            normalize_url("url").alias("norm"),
        ).collect()
    }
    assert got[0] == ("www.example.com", "example.com", 2, "http://user@www.example.com/a/b")
    assert got[1] == ("example.com", "example.com", 1, "https://example.com/a")
    assert got[2] == ("news.bbc.co.uk", "bbc.co.uk", 3, "http://news.bbc.co.uk/x/y/z")
    assert got[3] == ("example.org", "example.org", 0, "http://example.org")
    assert got[4] == ("", "", 0, "not a url")


def test_normalized_urls_collapse_crawl_duplicates(spark):
    """The motivating property: crawl-duplicate spellings of one page
    normalize to a single vertex key."""
    dupes = [
        "HTTP://Example.com:80/page",
        "http://example.com/page",
        "http://EXAMPLE.COM/page/",
        "http://example.com/page#section-2",
    ]
    df = spark.createDataFrame([(u,) for u in dupes], "url string")
    n = df.select(normalize_url("url").alias("n")).distinct().count()
    assert n == 1


def test_build_graph_normalize_collapses_duplicate_vertices(spark):
    """Two spellings of one page merge into a single vertex and their
    outgoing links land on the merged id."""
    pages = [
        ("http://a.com/p", b"<a href='HTTP://B.com:80/x#f'>l</a>"),
        ("HTTP://A.com:80/p/", b"<a href='http://c.com/'>l</a>"),
        ("http://b.com/x", b""),
        ("http://c.com", b""),
    ]
    df = spark.createDataFrame(pages, "url string, html binary")
    from amanogawa_spark.graph.build import build_graph

    raw = build_graph(df)
    norm = build_graph(df, normalize=True)
    assert raw.vertices.count() == 4  # duplicate spelling kept as junk vertex
    assert norm.vertices.count() == 3
    # normalized: a.com/p -> b.com/x and a.com/p -> c.com both resolve
    ids = {r.url: r.id for r in norm.vertices.collect()}
    edges = {(r.src_id, r.dst_id) for r in norm.edges.collect()}
    assert (ids["http://a.com/p"], ids["http://b.com/x"]) in edges
    assert (ids["http://a.com/p"], ids["http://c.com"]) in edges


def test_surt_key_forms(spark):
    from amanogawa_spark.functions.url import surt_key

    rows = [
        (0, "https://www.Example.COM/A/b?Q=1#frag"),
        (1, "http://a.b.example.com:8080/p"),
        (2, "http://example.org"),
        (3, "not a url"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["s"] for r in df.select("id", surt_key("url").alias("s")).collect()}
    assert got[0] == "com,example)/a/b?q=1"
    assert got[1] == "com,example,b,a)/p"
    assert got[2] == "org,example)"
    assert got[3] == ""


def test_surt_key_sorts_domains_contiguously(spark):
    from amanogawa_spark.functions.url import surt_key

    urls = [
        "http://a.example.com/1",
        "http://b.example.com/2",
        "http://www.example.com/3",
        "http://aexample.net/x",   # lexically between a.example and b.example as plain hosts
        "http://z-site.org/y",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    keys = [r["s"] for r in df.select(surt_key("url").alias("s")).orderBy("s").collect()]
    ex = [k for k in keys if k.startswith("com,example")]
    lo, hi = keys.index(ex[0]), keys.index(ex[-1])
    assert hi - lo + 1 == len(ex) == 3  # the domain block is contiguous


def test_host_disjoint_split_is_leak_free_and_stable(spark):
    from amanogawa_spark.operators.sampling import host_disjoint_split

    rows = [
        (i, f"http://{'abcdefghij'[i % 10]}site{i % 200}.com/p/{i}") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = host_disjoint_split(df, "url")
    got = [(r["id"], r["rdom"], r["split"]) for r in out.collect()]
    # leak-free: one split per registered domain
    by_dom = {}
    for _, dom, split in got:
        by_dom.setdefault(dom, set()).add(split)
    assert all(len(s) == 1 for s in by_dom.values())
    # stable under repartitioning
    got2 = [(r["id"], r["rdom"], r["split"]) for r in
            host_disjoint_split(df.repartition(7), "url").collect()]
    assert sorted(got) == sorted(got2)
    # all three splits materialize and train dominates
    counts = {}
    for _, _, split in got:
        counts[split] = counts.get(split, 0) + 1
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] + counts["test"]


def test_host_disjoint_split_rejects_bad_weights(spark):
    import pytest

    from amanogawa_spark.operators.sampling import host_disjoint_split

    df = spark.createDataFrame([(0, "http://a.com/x")], "id long, url string")
    with pytest.raises(ValueError):
        host_disjoint_split(df, "url", weights={"train": 0.5, "test": 0.2})
