"""Content snapshot comparison (operators/snapshots.py): churn classes
and moved-pair inference on hand-built crawl pairs."""

from __future__ import annotations

from amanogawa_spark.operators.snapshots import content_churn, moved_content


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["url", "text"])


def test_churn_classes(spark):
    old = _snap(
        spark,
        [
            ("http://a.com/1", "stays put"),
            ("http://a.com/2", "moves away"),
            ("http://a.com/3", "gets deleted"),
        ],
    )
    new = _snap(
        spark,
        [
            ("http://a.com/1", "stays put"),
            ("http://b.org/x", "moves away"),
            ("http://a.com/4", "brand new"),
        ],
    )
    row = content_churn(old, new).collect()[0]
    assert (
        row["n_unchanged"],
        row["n_moved"],
        row["n_added"],
        row["n_removed"],
    ) == (1, 1, 1, 1)


def test_moved_pairs(spark):
    old = _snap(spark, [("http://a.com/2", "moves away")])
    new = _snap(spark, [("http://b.org/x", "moves away")])
    rows = moved_content(old, new).collect()
    assert len(rows) == 1
    assert (rows[0]["old_url"], rows[0]["new_url"]) == (
        "http://a.com/2",
        "http://b.org/x",
    )


def test_duplicated_url_not_moved(spark):
    # content served at BOTH the old and a new address: the shared URL
    # makes it unchanged, not moved
    old = _snap(spark, [("http://a.com/1", "dup")])
    new = _snap(spark, [("http://a.com/1", "dup"), ("http://mirror.com/1", "dup")])
    assert moved_content(old, new).count() == 0
    row = content_churn(old, new).collect()[0]
    assert row["n_unchanged"] == 1 and row["n_moved"] == 0


def test_max_per_fp_guard(spark):
    # soft-404 template on 5 old and 5 new urls: above the cap → dropped
    old = _snap(spark, [(f"http://a.com/{i}", "not found") for i in range(5)])
    new = _snap(spark, [(f"http://b.com/{i}", "not found") for i in range(5)])
    assert moved_content(old, new, max_per_fp=4).count() == 0
    assert moved_content(old, new, max_per_fp=5).count() == 25


def test_normalization_invariance(spark):
    old = _snap(spark, [("http://a.com/1", "  Same   TEXT ")])
    new = _snap(spark, [("http://b.com/9", "same text")])
    assert moved_content(old, new).count() == 1
