"""URL template induction + per-host duplication profile (crawl-trap
detectors): hand-value oracles on synthetic URL sets."""

from __future__ import annotations

from amanogawa_spark.functions.url import url_template_stats, url_templates
from amanogawa_spark.operators.dedup import host_dup_profile


def test_url_templates_wildcard_and_literal_positions(spark):
    urls = (
        [(f"http://a.com/product/{i}",) for i in range(15)]
        + [("http://a.com/about",)] * 3
        + [(f"http://a.com/blog/{i % 2}/x",) for i in range(12)]
    )
    df = spark.createDataFrame(urls, "url string")
    got = {
        (r["host"], r["template"]): r["n_urls"]
        for r in url_template_stats(df, wildcard_min_distinct=10).collect()
    }
    # 15 distinct product ids >= 10 -> wildcard; 'about' literal;
    # blog middle has 2 distinct (<10, literal) and tail 'x' 1 distinct
    assert got[("a.com", "/product/*")] == 15
    assert got[("a.com", "/about")] == 3
    assert got[("a.com", "/blog/0/x")] == 6
    assert got[("a.com", "/blog/1/x")] == 6
    assert len(got) == 4


def test_url_templates_rootless_and_per_host_isolation(spark):
    urls = [("http://a.com/",), ("http://a.com",)] + [
        (f"http://b.com/p/{i}",) for i in range(10)
    ]
    df = spark.createDataFrame(urls, "url string")
    rows = url_templates(df, wildcard_min_distinct=10).collect()
    by_url = {r["url"]: (r["host"], r["template"], r["n_segs"]) for r in rows}
    assert by_url["http://a.com/"] == ("a.com", "/", 0)
    assert by_url["http://a.com"] == ("a.com", "/", 0)
    # b.com's cardinality does not leak into a.com's classing
    assert by_url["http://b.com/p/3"][1] == "/p/*"
    assert len(rows) == len(urls)  # every input row kept


def test_host_dup_profile_flags_trap_hosts(spark):
    rows = [(f"http://trap.com/p{i}", "same page") for i in range(30)]
    rows += [(f"http://ok.com/p{i}", f"unique text {i}") for i in range(30)]
    rows += [(f"http://small.com/p{i}", "same page") for i in range(5)]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["host"]: r for r in host_dup_profile(df, min_urls=20).collect()}
    assert got["trap.com"]["is_trap"] and got["trap.com"]["n_distinct"] == 1
    assert not got["ok.com"]["is_trap"] and got["ok.com"]["dup_ratio"] == 0.0
    # duplicated but below min_urls: not flagged
    assert not got["small.com"]["is_trap"]
    assert got["trap.com"]["dup_ratio"] > 0.96


def test_extract_canonical_attribute_orders_and_absence(spark):
    from amanogawa_spark.functions.html import extract_canonical

    rows = [
        (1, b'<html><link rel="canonical" href="http://a.com/x"/></html>'),
        (2, b"<html><link href='http://a.com/y' rel='canonical'/></html>"),
        (3, b"<html><p>no canonical</p></html>"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {r["id"]: r["c"] for r in df.select("id", extract_canonical("html").alias("c")).collect()}
    assert got[1] == "http://a.com/x"
    assert got[2] == "http://a.com/y"
    assert got[3] is None and got[4] is None


def test_canonical_dedup_groups_and_representatives(spark):
    from amanogawa_spark.operators.dedup import canonical_dedup

    def pg(url, canon=None):
        h = (
            f'<html><link rel="canonical" href="{canon}"/><p>b</p></html>'
            if canon
            else "<html><p>b</p></html>"
        )
        return (url, h.encode())

    rows = [
        pg("http://a.com/main"),                       # canonical target, crawled
        pg("http://a.com/main?sid=1", "http://a.com/main"),
        pg("http://a.com/print", "http://a.com/main"),
        pg("http://b.com/p1", "http://b.com/missing"),  # canonical NOT crawled
        pg("http://b.com/p2", "http://b.com/missing"),
        pg("http://c.com/solo"),                        # singleton
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: (r["canonical_url"], r["keep"]) for r in canonical_dedup(df).collect()}
    assert got["http://a.com/main"] == ("http://a.com/main", True)
    assert got["http://a.com/main?sid=1"] == ("http://a.com/main", False)
    assert got["http://a.com/print"] == ("http://a.com/main", False)
    # canonical absent from corpus: smallest member represents the group
    assert got["http://b.com/p1"] == ("http://b.com/missing", True)
    assert got["http://b.com/p2"] == ("http://b.com/missing", False)
    assert got["http://c.com/solo"] == ("http://c.com/solo", True)


def test_hreflang_edges_and_clusters(spark):
    from amanogawa_spark.operators.bitext import hreflang_clusters, hreflang_edges

    def pg(url, variants):
        links = "".join(
            f'<link rel="alternate" hreflang="{hl}" href="{h}"/>' for hl, h in variants
        )
        return (url, f"<html>{links}<p>b</p></html>".encode())

    full = [("en", "http://x.com/en"), ("de", "http://x.com/de"), ("fr", "http://x.com/fr")]
    rows = [
        pg("http://x.com/en", full),
        pg("http://x.com/de", full),
        pg("http://x.com/fr", full),
        pg("http://y.com/solo", []),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    edges = hreflang_edges(df).collect()
    assert len(edges) == 9
    assert {(r["url"], r["hreflang"], r["href"]) for r in edges} >= {
        ("http://x.com/en", "de", "http://x.com/de"),
        ("http://x.com/fr", "en", "http://x.com/en"),
    }
    cl = {r["url"]: (r["cluster_id"], r["n_variants"]) for r in hreflang_clusters(df).collect()}
    assert cl["http://x.com/en"] == ("http://x.com/de", 3)
    assert cl["http://x.com/de"] == ("http://x.com/de", 3)
    assert cl["http://x.com/fr"] == ("http://x.com/de", 3)
    assert cl["http://y.com/solo"] == ("http://y.com/solo", 1)


def test_extract_title_normalizes(spark):
    from amanogawa_spark.functions.html import extract_title

    rows = [
        (1, b"<html><title>  A &amp; B \n  Story </title></html>"),
        (2, b"<html><p>no title</p></html>"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {r["id"]: r["t"] for r in df.select("id", extract_title("html").alias("t")).collect()}
    assert got[1] == "A & B Story"
    assert got[2] is None and got[3] is None


def test_tracking_param_rules_from_canonical_pairs(spark):
    from amanogawa_spark.functions.url import tracking_param_rules

    rows = []
    for i in range(12):
        base = f"http://s.com/p{i}"
        rows.append((f"{base}?id={i}&utm_source=x&sid=z{i}", f"{base}?id={i}"))
    # a cross-base canonical: says nothing about params, must be ignored
    rows.append(("http://s.com/a?utm_source=x", "http://s.com/b"))
    # identical url/canonical: no evidence
    rows.append(("http://s.com/c?id=1", "http://s.com/c?id=1"))
    df = spark.createDataFrame(rows, "url string, canonical_url string")
    got = {
        (r["host"], r["param"]): (r["n_removed"], r["n_kept"], r["is_tracking"])
        for r in tracking_param_rules(df, min_obs=5).collect()
    }
    assert got[("s.com", "utm_source")] == (12, 0, True)
    assert got[("s.com", "sid")] == (12, 0, True)
    assert got[("s.com", "id")] == (0, 12, False)
    assert len(got) == 3  # the ignored pairs contributed nothing


def test_apply_param_rules_strips_only_learned_params(spark):
    from amanogawa_spark.functions.url import apply_param_rules

    rules = spark.createDataFrame(
        [("s.com", "utm", 10, 0, 1.0, True), ("s.com", "id", 0, 10, 0.0, False)],
        "host string, param string, n_removed long, n_kept long, "
        "removal_frac_r double, is_tracking boolean",
    )
    urls = [
        ("http://s.com/p?utm=x&id=3&utm=y",),     # dup tracking param: both go
        ("http://s.com/p?utm=x",),                # all params tracking -> bare base
        ("http://s.com/p",),                      # no query: unchanged
        ("http://other.com/p?utm=x#frag",),       # no rules host: only frag strip
    ]
    df = spark.createDataFrame(urls, "url string")
    got = {r["url"]: r["normalized_url"] for r in apply_param_rules(df, rules).collect()}
    assert got["http://s.com/p?utm=x&id=3&utm=y"] == "http://s.com/p?id=3"
    assert got["http://s.com/p?utm=x"] == "http://s.com/p"
    assert got["http://s.com/p"] == "http://s.com/p"
    assert got["http://other.com/p?utm=x#frag"] == "http://other.com/p?utm=x"
