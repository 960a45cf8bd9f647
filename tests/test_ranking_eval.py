from __future__ import annotations

import math

from amanogawa_spark.operators.ranking import ranking_metrics


def test_ranking_metrics_hand_computed(spark):
    # query A: ranked docs by score desc -> 10(rel2), 11(rel0), 12(rel1)
    results = spark.createDataFrame(
        [("A", 10, 3.0), ("A", 11, 2.0), ("A", 12, 1.0), ("B", 20, 9.0), ("B", 21, 8.0)],
        ["query_id", "doc_id", "score"],
    )
    qrels = spark.createDataFrame(
        [("A", 10, 2), ("A", 12, 1), ("A", 99, 3), ("B", 21, 1)],
        ["query_id", "doc_id", "rel"],
    )
    got = {r["query_id"]: r for r in ranking_metrics(results, qrels, k=3).collect()}

    # A: DCG = (2^2-1)/log2(2) + 0 + (2^1-1)/log2(4) = 3 + 0.5 = 3.5
    #    IDCG over judged {3,2,1} = 7/log2(2) + 3/log2(3) + 1/log2(4)
    idcg = 7.0 + 3.0 / math.log2(3.0) + 0.5
    assert abs(got["A"]["ndcg_r"] - round(3.5 / idcg, 8)) < 1e-9
    assert got["A"]["mrr_r"] == 1.0  # first hit at rank 1
    assert abs(got["A"]["precision_r"] - round(2 / 3.0, 8)) < 1e-9
    assert abs(got["A"]["recall_r"] - round(2 / 3.0, 8)) < 1e-9  # 99 never retrieved

    # B: only rank-2 doc is relevant
    assert got["B"]["mrr_r"] == 0.5
    assert abs(got["B"]["recall_r"] - 1.0) < 1e-9


def test_ranking_metrics_unjudged_query_zeroes(spark):
    results = spark.createDataFrame([("Z", 1, 1.0), ("Z", 2, 0.5)], ["query_id", "doc_id", "score"])
    qrels = spark.createDataFrame([("Y", 1, 1)], ["query_id", "doc_id", "rel"])
    row = ranking_metrics(results, qrels, k=5).collect()
    z = [r for r in row if r["query_id"] == "Z"][0]
    assert (z["ndcg_r"], z["mrr_r"], z["precision_r"], z["recall_r"]) == (0.0, 0.0, 0.0, 0.0)
