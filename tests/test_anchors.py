"""Anchor-text extraction + aggregation (graph/anchors.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from amanogawa_spark.functions.html import _anchors_of, extract_anchors
from amanogawa_spark.graph.anchors import anchor_edges, anchor_top_terms

PAGE_SCHEMA = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("html", T.BinaryType())]
)


def test_anchors_of_edge_cases():
    html = (
        b"<html><body>"
        b'<a href="https://a.example/x">Plain Label</a>'
        b"<a href='https://b.example/y'>single <b>quoted</b> bold</a>"
        b'<a class="c" href="https://c.example/z" rel="nofollow">attrs &amp; entities</a>'
        b'<a href="https://d.example/w">multi\n  line\n  label</a>'
        b"<a name='no-href-anchor'>not a link</a>"
        b'<a href="https://e.example/v"></a>'
        b"</body></html>"
    )
    got = _anchors_of(html)
    assert got == [
        {"href": "https://a.example/x", "anchor": "Plain Label"},
        {"href": "https://b.example/y", "anchor": "single quoted bold"},
        {"href": "https://c.example/z", "anchor": "attrs & entities"},
        {"href": "https://d.example/w", "anchor": "multi line label"},
        {"href": "https://e.example/v", "anchor": ""},
    ]
    assert _anchors_of(None) == []
    assert _anchors_of(b"<p>no links</p>") == []


def test_extract_anchors_udf_matches_pure_function(spark):
    htmls = [
        b'<a href="u1">one</a><a href="u2">two words</a>',
        b"<div>none</div>",
        None,
    ]
    df = spark.createDataFrame(
        [(f"p{i}", h) for i, h in enumerate(htmls)], PAGE_SCHEMA
    )
    rows = {
        r["url"]: [(a["href"], a["anchor"]) for a in r["a"]]
        for r in df.select("url", extract_anchors("html").alias("a")).collect()
    }
    assert rows["p0"] == [("u1", "one"), ("u2", "two words")]
    assert rows["p1"] == []
    assert rows["p2"] == []


def _mini_pages(spark):
    # 3 pages; page a and b both link to c with labels; b links twice to c
    # (multiplicity = two votes); a self-link on a must be dropped.
    pages = [
        (
            "https://s/a",
            b'<a href="https://s/c">spark graph</a><a href="https://s/a">self</a>',
        ),
        (
            "https://s/b",
            b'<a href="https://s/c">graph engine</a><a href="https://s/c">graph</a>'
            b'<a href="https://s/unknown">dangling</a>',
        ),
        ("https://s/c", b"<p>leaf</p>"),
    ]
    return spark.createDataFrame(pages, PAGE_SCHEMA)


def test_anchor_edges_and_top_terms(spark):
    pages = _mini_pages(spark)
    verts = spark.createDataFrame(
        [("https://s/a", 0), ("https://s/b", 1), ("https://s/c", 2)], ["url", "id"]
    )
    labeled = anchor_edges(pages, verts, broadcast_vertices=True)
    got = sorted(tuple(r) for r in labeled.collect())
    # self-link dropped, unknown-url link dropped, multiplicity kept
    assert got == [
        (0, 2, "spark graph"),
        (1, 2, "graph"),
        (1, 2, "graph engine"),
    ]

    top = anchor_top_terms(labeled, k=2)
    rows = sorted(tuple(r) for r in top.collect())
    # term counts at dst 2: graph=3, engine=1, spark=1 → top-2 = graph, engine
    assert rows == [(2, "engine", 1, 2), (2, "graph", 3, 1)]


def test_anchor_terms_repartition_invariant(spark):
    pages = _mini_pages(spark)
    verts = spark.createDataFrame(
        [("https://s/a", 0), ("https://s/b", 1), ("https://s/c", 2)], ["url", "id"]
    )
    a = anchor_top_terms(anchor_edges(pages.repartition(1), verts), k=3)
    b = anchor_top_terms(anchor_edges(pages.repartition(7), verts), k=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_anchor_plan_no_cartesian(spark):
    pages = _mini_pages(spark)
    verts = spark.createDataFrame([("https://s/a", 0)], ["url", "id"])
    plan = anchor_top_terms(anchor_edges(pages, verts))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
