"""Word co-occurrence + PMI (operators/cooccur.py): hand-counted
windows, canonicalization, and the map-side (join-free) pair plan."""

from __future__ import annotations

import math

import pytest

from amanogawa_spark.operators.cooccur import cooccurrence_pairs, pmi_scores


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_window_pairs_hand_counted(spark):
    # "a b c" window 2 → (a,b), (b,c), (a,c); canonical order
    d = _docs(spark, ["a b c"])
    got = {
        (r["term_a"], r["term_b"]): r["n_pair"]
        for r in cooccurrence_pairs(d, window=2).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}


def test_window_one_adjacent_only(spark):
    d = _docs(spark, ["a b c d"])
    got = {
        (r["term_a"], r["term_b"]): r["n_pair"]
        for r in cooccurrence_pairs(d, window=1).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1}


def test_unordered_canonicalization_merges(spark):
    # "b a" and "a b" are the same unordered pair
    d = _docs(spark, ["b a", "a b"])
    got = cooccurrence_pairs(d, window=1).collect()
    assert len(got) == 1
    assert (got[0]["term_a"], got[0]["term_b"], got[0]["n_pair"]) == ("a", "b", 2)


def test_self_pairs_dropped(spark):
    d = _docs(spark, ["x x x"])
    assert cooccurrence_pairs(d, window=2).count() == 0


def test_pmi_hand_value(spark):
    # corpus: "a b" ×3 → pairs: (a,b)=3, P=3; tokens: a=3, b=3, T=6
    # pmi = ln( (3/3) / ((3/6)*(3/6)) ) = ln 4
    d = _docs(spark, ["a b"] * 3)
    rows = pmi_scores(d, window=2, min_count=2).collect()
    assert len(rows) == 1
    assert rows[0]["pmi"] == pytest.approx(round(math.log(4), 6))


def test_pair_generation_is_join_free(spark):
    d = _docs(spark, ["a b c"])
    plan = (
        cooccurrence_pairs(d, window=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_min_count_filters(spark):
    d = _docs(spark, ["a b", "a c"])
    assert pmi_scores(d, window=1, min_count=2).count() == 0


def test_textrank_hub_term_ranks_first(spark):
    # "hub" co-occurs with every other term; TextRank must rank it top
    from pyspark.sql import functions as F

    from amanogawa_spark.graph.pagerank import pagerank_fixed_iterations

    d = _docs(spark, ["hub alpha", "hub beta", "hub gamma"] * 2)
    p = cooccurrence_pairs(d, window=1).filter(F.col("n_pair") >= 2)
    e = p.select(
        F.col("term_a").alias("src_id"),
        F.col("term_b").alias("dst_id"),
        F.col("n_pair").cast("double").alias("weight"),
    ).unionAll(
        p.select(
            F.col("term_b").alias("src_id"),
            F.col("term_a").alias("dst_id"),
            F.col("n_pair").cast("double").alias("weight"),
        )
    )
    v = (
        e.select(F.col("src_id").alias("id"))
        .unionAll(e.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    ranks = pagerank_fixed_iterations(v, e, iterations=5, weight_col="weight")
    top = ranks.orderBy(F.desc("rank")).first()
    assert top["id"] == "hub"
