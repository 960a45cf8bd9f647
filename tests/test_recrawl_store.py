"""Recrawl replacement store (streaming/ingest.py append_recrawl /
resolve_current_edges): a re-crawled page replaces its out-link set."""

from __future__ import annotations

import datetime

from amanogawa_spark.streaming.ingest import (
    append_recrawl,
    resolve_current_edges,
)

_TS = datetime.datetime(2026, 8, 18, 0, 0, 0)


def _page(url, hrefs):
    html = "".join(f'<a href="{h}">x</a>' for h in hrefs).encode()
    return (url, _TS, html, "t", "en")


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def _ids(spark, store):
    import pyspark.sql.functions as F

    v = spark.read.parquet(f"{store}/vertices")
    return {r["url"]: r["id"] for r in v.collect()}


def test_recrawl_replaces_dropped_links(spark, tmp_path):
    store = str(tmp_path / "store")
    a, b, c, d = "http://a/", "http://b/", "http://c/", "http://d/"
    g0 = append_recrawl(spark, _batch(spark, [
        _page(a, [b, c]), _page(b, [c]), _page(c, []),
    ]), store)
    assert g0 == 0
    ids = _ids(spark, store)
    got0 = {(r["src_id"], r["dst_id"]) for r in resolve_current_edges(spark, store).collect()}
    assert got0 == {(ids[a], ids[b]), (ids[a], ids[c]), (ids[b], ids[c])}

    # recrawl A dropping A->C; discover D linking to A
    g1 = append_recrawl(spark, _batch(spark, [
        _page(a, [b]), _page(d, [a]),
    ]), store)
    assert g1 == 1
    ids = _ids(spark, store)
    got1 = {(r["src_id"], r["dst_id"]) for r in resolve_current_edges(spark, store).collect()}
    assert got1 == {(ids[a], ids[b]), (ids[b], ids[c]), (ids[d], ids[a])}

    # recrawl B with ZERO out-links: manifest must erase b->c
    append_recrawl(spark, _batch(spark, [_page(b, [])]), store)
    got2 = {(r["src_id"], r["dst_id"]) for r in resolve_current_edges(spark, store).collect()}
    assert got2 == {(ids[a], ids[b]), (ids[d], ids[a])}


def test_recrawl_store_feeds_incremental_repair(spark, tmp_path):
    """The store's before/after views drive incremental_pagerank to the
    same ranks a cold run on the after view produces."""
    import pyspark.sql.functions as F

    from amanogawa_spark.graph.incremental import incremental_pagerank
    from amanogawa_spark.graph.pagerank import pagerank

    store = str(tmp_path / "store2")
    urls = [f"http://site{i}/" for i in range(12)]
    batch0 = [_page(urls[i], [urls[(i + 1) % 12], urls[(i + 5) % 12]]) for i in range(12)]
    append_recrawl(spark, _batch(spark, batch0), store)
    old_edges = resolve_current_edges(spark, store).persist()
    old_edges.count()
    verts = spark.read.parquet(f"{store}/vertices").select("id")
    old = pagerank(verts, old_edges, tol=1e-10, max_iter=300)

    # recrawl 3 pages with changed link sets (no new urls -> same universe)
    append_recrawl(spark, _batch(spark, [
        _page(urls[0], [urls[2]]),
        _page(urls[4], [urls[5], urls[9], urls[1]]),
        _page(urls[7], []),
    ]), store)
    new_edges = resolve_current_edges(spark, store).persist()
    new_edges.count()

    inc = incremental_pagerank(old.ranks, old_edges, new_edges, tol=1e-9)
    cold = pagerank(verts, new_edges, tol=1e-12, max_iter=300)
    got = {r["id"]: r["rank"] for r in inc.ranks.collect()}
    want = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    assert max(abs(got[i] - want[i]) for i in got) < 1e-6


def _run_incr_cli(argv, capsys):
    import importlib.util
    import json as _json
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "run_incremental_job", repo / "tools" / "run_incremental_job.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["run_incremental_job.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    return _json.loads([line for line in out if line.startswith("{")][-1])


def test_incremental_cli_recrawl_repair_mode(spark, tmp_path, capsys):
    """Batch 1 (discovery) -> warm mode; batch 2 (pure recrawl, same urls)
    -> repair mode, ranks matching a cold run on the replaced graph."""
    import pyspark.sql.functions as F

    from amanogawa_spark.graph.pagerank import pagerank
    from amanogawa_spark.streaming.ingest import resolve_current_edges

    store = str(tmp_path / "store3")
    urls = [f"http://s{i}/" for i in range(10)]
    b0 = [_page(urls[i], [urls[(i + 1) % 10], urls[(i + 3) % 10]]) for i in range(10)]
    p0 = str(tmp_path / "b0")
    _batch(spark, b0).write.parquet(p0)
    meta0 = _run_incr_cli(
        ["--new-pages", p0, "--store", store,
         "--ranks-out", str(tmp_path / "r0"), "--recrawl"],
        capsys,
    )
    assert meta0["mode"] == "warm"  # first sight of every url

    b1 = [_page(urls[0], [urls[5]]), _page(urls[4], [])]
    p1 = str(tmp_path / "b1")
    _batch(spark, b1).write.parquet(p1)
    meta1 = _run_incr_cli(
        ["--new-pages", p1, "--store", store,
         "--ranks-out", str(tmp_path / "r1"),
         "--warm-ranks", str(tmp_path / "r0" / "ranks"), "--recrawl"],
        capsys,
    )
    assert meta1["mode"] == "repair"

    got = {
        r["id"]: r["rank"]
        for r in spark.read.parquet(str(tmp_path / "r1" / "ranks")).collect()
    }
    verts = spark.read.parquet(f"{store}/vertices").select("id")
    cold = pagerank(verts, resolve_current_edges(spark, store), tol=1e-10, max_iter=300)
    want = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    assert max(abs(got[i] - want[i]) for i in got) < 1e-4  # both at tol=1e-6
