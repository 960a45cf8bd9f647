"""Lexicon tagging / blocklist filter — Python-mirror and contract tests.

The oracle_suite entry (q_lexicon_hits) value-checks the operator against
DuckDB; here we pin the semantics against a hand-rolled Python mirror on
adversarial inputs (phrases across punctuation, empty docs, repeated
terms, case folding) and the blocklist threshold contract.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from amanogawa_spark.operators.lexicon import blocklist_filter, lexicon_hits

DOCS = [
    (0, "Slow HASH slow: a fast table scan"),
    (1, ""),
    (2, "fast, table"),          # punctuation splits → bigram "fast table" DOES match
    (3, "fasttable fast stable"),  # no bigram: tokens are fasttable/fast/stable
    (4, "hash hash hash hash"),
    (5, "nothing to see here"),
    (6, "... !!! ???"),          # tokenizes to zero tokens
]
LEX = ["slow", "hash", "fast table"]


def _mirror(text: str) -> tuple[int, int, float, str]:
    ts = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    grams = ts + [" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)]
    matched = sorted({g for g in grams if g in LEX})
    hits = sum(1 for g in grams if g in LEX)
    frac = round(hits / len(ts), 8) if ts else 0.0
    return len(ts), hits, frac, ",".join(matched)


def test_lexicon_hits_matches_python_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["hits"], r["hit_frac"], r["matched_csv"])
        for r in lexicon_hits(df, LEX).collect()
    }
    assert set(got) == {d[0] for d in DOCS}
    for doc_id, text in DOCS:
        assert got[doc_id] == _mirror(text), f"doc {doc_id}: {text!r}"


def test_phrase_matches_only_adjacent_tokens(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["id"]: r["matched_csv"] for r in lexicon_hits(df, LEX).collect()}
    assert "fast table" in out[0]
    assert "fast table" in out[2]  # punctuation between tokens is not a word
    assert "fast table" not in out[3]  # substring of other tokens never matches


def test_zero_hit_and_empty_docs_are_kept(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["id"]: r for r in lexicon_hits(df, LEX).collect()}
    assert rows[5]["hits"] == 0 and rows[5]["matched_csv"] == ""
    assert rows[6]["n_tokens"] == 0 and rows[6]["hit_frac"] == 0.0


def test_blocklist_filter_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # max_frac=0.0: only docs with zero lexicon tokens survive
    strict = {r["doc_id"] for r in blocklist_filter(df, LEX).collect()}
    assert strict == {1, 3, 5, 6}
    # permissive threshold keeps low-fraction docs, drops the hash-spam doc
    loose = {
        r["doc_id"]
        for r in blocklist_filter(df, ["hash"], max_frac=0.5).collect()
    }
    assert 4 not in loose and {0, 1, 2, 3, 5, 6} <= loose
    # output schema is the caller's schema, untouched
    assert blocklist_filter(df, LEX).columns == df.columns


def test_lexicon_normalization_and_repartition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = lexicon_hits(df, LEX)
    # case/space variants of the lexicon normalize to the same terms
    b = lexicon_hits(df.repartition(7), ["SLOW", "  hash ", "Fast   Table"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_plan_has_broadcast_join_no_token_shuffle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = lexicon_hits(df, LEX)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only SortMergeJoin allowed is the per-doc left join of the
    # aggregate back onto base — the token/gram stream itself must meet
    # the lexicon via broadcast, never a shuffle
    assert plan.count("SortMergeJoin") <= 1
