"""Positional phrase search (operators/retrieval.py): hand-counted
occurrences, overlaps, duplicate phrase terms, multi-term chains."""

from __future__ import annotations

import pytest

from amanogawa_spark.operators.retrieval import phrase_search, positional_postings


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_positional_postings_sorted(spark):
    d = _docs(spark, ["b a b a b"])
    got = {
        r["term"]: r["positions"] for r in positional_postings(d).collect()
    }
    assert got == {"b": [0, 2, 4], "a": [1, 3]}


def test_two_term_phrase(spark):
    d = _docs(spark, ["the quick brown fox", "brown the quick", "quick the brown"])
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(d, "the quick").collect()
    }
    assert got == {0: 1, 1: 1}


def test_three_term_chain(spark):
    d = _docs(spark, ["x a b c y", "a b x c", "a b c a b c"])
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(d, "a b c").collect()
    }
    assert got == {0: 1, 2: 2}


def test_overlapping_occurrences_counted(spark):
    # "a a a" contains "a a" at starts 0 and 1 — replace-based counting
    # would miss the overlap
    d = _docs(spark, ["a a a"])
    got = phrase_search(d, "a a").collect()
    assert got[0]["n_occurrences"] == 2


def test_duplicate_term_phrase(spark):
    d = _docs(spark, ["go stop go go stop"])
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(d, "go go").collect()
    }
    assert got == {0: 1}


def test_missing_term_no_match(spark):
    d = _docs(spark, ["alpha beta"])
    assert phrase_search(d, "alpha missing").count() == 0


def test_case_and_whitespace_normalized(spark):
    d = _docs(spark, ["  The   QUICK  fox "])
    assert phrase_search(d, "the quick").count() == 1


def test_empty_phrase_rejected(spark):
    d = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        phrase_search(d, "   ")
