"""WARC ingestion: parse parity with the parquet pages path.

The fixture corpus is serialized into WARC files (both plain and
Common-Crawl-style per-record-gzip layouts), read back through
``read_warc``/``warc_pages``, and checked byte-for-byte against the
fixture ground truth — so a WARC-fed pipeline is provably identical to
a parquet-fed one on the same pages.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_members,
    read_warc,
    warc_pages,
)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory, corpus):
    """Two WARC files (one plain, one gzip-per-record) + junk records."""
    d = tmp_path_factory.mktemp("warc")
    pages = corpus.pages.head(60)
    recs = [
        {"url": r.url, "warc_ts": r.warc_ts.to_pydatetime(), "html": bytes(r.html)}
        for r in pages.itertuples()
    ]
    # non-response / non-200 records must be filtered by warc_pages
    junk = [
        {
            "url": "http://junk.example/req",
            "warc_ts": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
            "html": b"GET / HTTP/1.1\r\n\r\n",
            "record_type": "request",
        },
        {
            "url": "http://junk.example/404",
            "warc_ts": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
            "html": b"<html>gone</html>",
            "http_status": 404,
        },
    ]
    (d / "part0.warc").write_bytes(build_warc_bytes(recs[:30] + junk))
    (d / "part1.warc.gz").write_bytes(
        build_warc_bytes(recs[30:], gzip_per_record=True)
    )
    return str(d), pages


def test_parse_members_roundtrip(corpus):
    pages = corpus.pages.head(5)
    recs = [
        {"url": r.url, "warc_ts": r.warc_ts.to_pydatetime(), "html": bytes(r.html)}
        for r in pages.itertuples()
    ]
    parsed = list(parse_warc_members(build_warc_bytes(recs)))
    assert [p["url"] for p in parsed] == list(pages["url"])
    assert [p["payload"] for p in parsed] == [bytes(h) for h in pages["html"]]
    assert all(p["http_status"] == 200 for p in parsed)
    assert all(p["content_type"] == "text/html" for p in parsed)


def test_read_warc_both_layouts(spark, warc_dir):
    path, pages = warc_dir
    df = read_warc(spark, path, record_types=None)
    by_type = {r["record_type"]: r["n"] for r in df.groupBy("record_type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"response": 61, "request": 1}

    resp = read_warc(spark, path)  # default: response only
    got = {r["url"]: (bytes(r["payload"]), r["warc_ts"]) for r in resp.collect()}
    assert len(got) == 61
    for r in pages.itertuples():
        payload, ts = got[r.url]
        assert payload == bytes(r.html)  # byte-identical through gzip + HTTP framing
        assert ts == r.warc_ts.to_pydatetime().replace(tzinfo=None)


def test_warc_pages_matches_fixture(spark, warc_dir, corpus):
    path, pages = warc_dir
    df = warc_pages(spark, path)
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {r["url"]: r["text"] for r in df.collect()}
    # junk request/404 records dropped
    assert "http://junk.example/req" not in got
    assert "http://junk.example/404" not in got
    truth = corpus.pages.set_index("url")["text"]
    for url in pages["url"]:
        assert got[url] == truth[url]  # byte-identical extracted text


def test_warc_config_source(spark, warc_dir, tmp_path):
    """TOML job: warc source → parquet sink through the config CLI path."""
    from amanogawa_spark.plans.config import run_config

    path, pages = warc_dir
    out = str(tmp_path / "pages_out")
    toml = f"""
[source.crawl]
type = "file"
path = "{path}"
  [source.crawl.format]
  type = "warc"

[sink.store]
type = "file"
path = "{out}"
from = "crawl"
  [sink.store.format]
  type = "parquet"
"""
    (tmp_path / "job.toml").write_text(toml)
    run_config(str(tmp_path / "job.toml"), spark)
    back = spark.read.parquet(out)
    assert back.count() == 60  # the 404 and the request record are dropped
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang"}
