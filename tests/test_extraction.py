"""Byte-identical text extraction + exact link extraction (north-rule gates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.functions.html import extract_text
from amanogawa_spark.graph.build import extract_edges_urls


def test_extracted_text_byte_identical(spark, corpus, pages_df):
    got = (
        pages_df.select("url", extract_text("html").alias("extracted"), "text")
        .withColumn("match", F.col("extracted") == F.col("text"))
        .collect()
    )
    assert len(got) == len(corpus.pages)
    mismatches = [r for r in got if not r.match]
    assert mismatches == []
    # byte-level check on the driver too
    for r in got[:50]:
        assert r.extracted.encode("utf-8") == r.text.encode("utf-8")


def test_extracted_edges_exact_set(spark, corpus, pages_df):
    got = {
        (r.src_url, r.dst_url)
        for r in extract_edges_urls(pages_df).collect()
    }
    assert got == corpus.expected_edges


def test_extraction_invariant_under_repartitioning(spark, corpus, pages_df):
    one = {(r.src_url, r.dst_url) for r in extract_edges_urls(pages_df.repartition(1)).collect()}
    many = {(r.src_url, r.dst_url) for r in extract_edges_urls(pages_df.repartition(13)).collect()}
    assert one == many == corpus.expected_edges
