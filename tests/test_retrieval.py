"""Inverted index + BM25 (operators/retrieval.py) vs the pure-Python mirror."""

from __future__ import annotations

import pytest

from amanogawa_spark.operators.retrieval import (
    bm25_reference,
    bm25_scores,
    posting_lists,
)

CORPUS = {
    0: "spark graph engine for big graph data".split(),
    1: "the quick brown fox".split(),
    2: "graph graph graph spark".split(),
    3: "big data join merge join".split(),
    4: "a tiny doc".split(),
}
QUERIES = {10: ["graph", "spark"], 20: ["join", "data"], 30: ["absent"]}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in CORPUS.items()], ["doc_id", "text"]
    )


def test_bm25_matches_python_mirror(spark, docs_df):
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in QUERIES.items() for t in ts], ["query_id", "term"]
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score_r"]
        for r in bm25_scores(docs_df, qdf, k=10).collect()
    }
    want = {k: round(v, 6) for k, v in bm25_reference(CORPUS, QUERIES).items()}
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-6), key


def test_bm25_ranks_deterministic_and_bounded(spark, docs_df):
    qdf = spark.createDataFrame([(1, "graph")], ["query_id", "term"])
    rows = bm25_scores(docs_df, qdf, k=1).collect()
    # doc 2 has tf=3 of 'graph' in a 4-token doc: clear winner
    assert len(rows) == 1 and rows[0]["doc_id"] == 2 and rows[0]["rank"] == 1


def test_posting_lists_sorted_and_capped(spark, docs_df):
    rows = {r["term"]: r for r in posting_lists(docs_df).collect()}
    assert rows["graph"]["postings"] == "0:2,2:3"
    assert rows["graph"]["df_count"] == 2
    assert rows["join"]["postings"] == "3:2"
    capped = posting_lists(docs_df, max_postings=1)
    assert all(r["df_count"] <= 1 for r in capped.collect())


def test_bm25_no_cartesian_on_corpus_side(spark, docs_df):
    qdf = spark.createDataFrame([(1, "graph")], ["query_id", "term"])
    plan = (
        bm25_scores(docs_df, qdf)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_rrf_fuse_matches_hand_mirror(spark):
    from amanogawa_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank long"
    )
    got = {r["doc_id"]: (r["rrf_r"], r["rank"]) for r in rrf_fuse([r1, r2], k0=60, k=10).collect()}
    want_scores = {
        10: round(1 / 61, 8),
        11: round(1 / 62 + 1 / 61, 8),
        12: round(1 / 63, 8),
        13: round(1 / 62, 8),
    }
    assert {d: s for d, (s, _) in got.items()} == want_scores
    # 11 (in both lists) outranks everything
    assert got[11][1] == 1
    # full fused order: 11 (both lists), then 10 (1/61), 13 (1/62), 12 (1/63)
    assert [d for d, (_, rk) in sorted(got.items(), key=lambda kv: kv[1][1])] == [11, 10, 13, 12]


def test_rrf_fuse_topk_and_tie_break(spark):
    from amanogawa_spark.operators.retrieval import rrf_fuse

    r = spark.createDataFrame(
        [(1, d, 1) for d in (5, 3, 9)], "query_id long, doc_id long, rank long"
    )
    rows = rrf_fuse([r], k=2).collect()
    assert [x["doc_id"] for x in sorted(rows, key=lambda x: x["rank"])] == [3, 5]
