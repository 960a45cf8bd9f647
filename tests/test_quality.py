"""C4/Gopher quality filters: known-text value checks."""

from __future__ import annotations

from amanogawa_spark.operators.quality import (
    c4_line_filter,
    redact_pii,
    repetition_features,
)


def test_repetition_features_known(spark):
    text = "Buy now\nBuy now\nA real sentence here.\nbuy NOW \nAnother one."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = repetition_features(df).collect()[0]
    # normalized 'buy now' x3 of 5 lines
    assert r.n_lines == 5
    assert abs(r.dup_line_frac - 3 / 5) < 1e-12
    assert abs(r.top_line_frac - 3 / 5) < 1e-12


def test_c4_line_filter_known(spark):
    text = "menu\nThis line stays here.\nshort.\nNo punctuation line\nAlso kept for sure!"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = c4_line_filter(df).collect()[0]
    assert r.clean_text == "This line stays here.\nAlso kept for sure!"
    assert r.n_kept == 2 and r.n_dropped == 3
    # trailing digits must survive trimming (regression: F.trim arity bug)
    df2 = spark.createDataFrame(
        [(2, "Version two point 5.")], "doc_id long, text string"
    )
    assert c4_line_filter(df2).collect()[0].clean_text == "Version two point 5."


def test_redact_pii_known(spark):
    text = "Mail a.b@test.org or x@y.io, call +1 555 123 4567 today."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert r.n_emails == 2 and r.n_phones == 1
    assert "[EMAIL]" in r.redacted and "[PHONE]" in r.redacted
    assert "test.org" not in r.redacted and "555" not in r.redacted
