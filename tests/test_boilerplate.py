"""Boilerplate chunk removal (operators/boilerplate.py): hand-built
host corpora with known repeated fragments."""

from __future__ import annotations

import pytest

from amanogawa_spark.operators.boilerplate import (
    boilerplate_chunks,
    chunk_table,
    remove_boilerplate,
)

# host A: every doc ends with the same 2-token footer "contact us";
# host B: no repetition
_DOCS = [
    (1, "alpha beta gamma delta contact us", "A"),
    (2, "epsilon zeta eta theta contact us", "A"),
    (3, "iota kappa lambda mu contact us", "A"),
    (4, "unique words only here", "B"),
    (5, "другое solo text row", "B"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(
        rows or _DOCS, ["doc_id", "text", "source"]
    )


def test_chunk_table_windows(spark):
    d = _docs(spark, [(1, "a b c d e", "A")])
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_table(d, chunk_size=2).collect()
    )
    assert rows == [(0, "a b"), (1, "c d"), (2, "e")]


def test_footer_flagged(spark):
    flagged = boilerplate_chunks(
        _docs(spark), chunk_size=2, min_ratio=0.5, min_df=2
    ).collect()
    assert len(flagged) == 1
    row = flagged[0]
    assert row["group"] == "A"
    assert row["df"] == 3 and row["n_docs"] == 3
    assert row["df_ratio"] == pytest.approx(1.0)


def test_remove_footer_preserves_content(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(
            _docs(spark), chunk_size=2, min_ratio=0.5, min_df=2
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_chunks"] == 3 and out[1]["n_removed"] == 1
    # host B untouched
    assert out[4]["clean_text"] == "unique words only here"
    assert out[4]["n_removed"] == 0


def test_all_boilerplate_doc_becomes_empty(spark):
    rows = [
        (1, "contact us", "A"),
        (2, "contact us", "A"),
        (3, "contact us", "A"),
    ]
    out = remove_boilerplate(
        _docs(spark, rows), chunk_size=2, min_ratio=0.5, min_df=2
    ).collect()
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)


def test_min_df_guards_small_groups(spark):
    # ratio alone would flag a 1-of-1 doc's every chunk; min_df=2 stops it
    rows = [(1, "single doc text", "C")]
    assert (
        boilerplate_chunks(_docs(spark, rows), chunk_size=2, min_ratio=0.5, min_df=2).count()
        == 0
    )


def test_repartition_invariance(spark):
    d = _docs(spark)
    a = sorted(map(tuple, remove_boilerplate(d, chunk_size=2, min_ratio=0.5).collect()))
    b = sorted(
        map(
            tuple,
            remove_boilerplate(d.repartition(7), chunk_size=2, min_ratio=0.5).collect(),
        )
    )
    assert a == b
