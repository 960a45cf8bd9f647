"""Graph sparsification (graph/sparsify.py): top-k out-edge selection,
multiplicity handling, stats, and the one-shuffle plan shape."""

from __future__ import annotations

import pytest

from amanogawa_spark.graph.sparsify import sparsify_stats, top_k_out_edges


def _edges(spark, pairs, schema="src_id long, dst_id long"):
    return spark.createDataFrame(pairs, schema)


def test_topk_selection_and_tiebreak(spark):
    # src 1: dst 2 twice (w=2), dst 3 and 4 once each → k=2 keeps 2 then
    # the tie between 3 and 4 breaks to the smaller dst
    e = _edges(spark, [(1, 2), (1, 2), (1, 3), (1, 4), (5, 6)])
    rows = {
        (r["src_id"], r["dst_id"]): (r["weight"], r["rank"])
        for r in top_k_out_edges(e, k=2).collect()
    }
    assert rows == {
        (1, 2): (2.0, 1),
        (1, 3): (1.0, 2),
        (5, 6): (1.0, 1),
    }


def test_weighted_path_sums_duplicates(spark):
    e = spark.createDataFrame(
        [(1, 2, 0.5), (1, 2, 0.75), (1, 3, 1.0)],
        "src_id long, dst_id long, w double",
    )
    rows = {
        r["dst_id"]: (r["weight"], r["rank"])
        for r in top_k_out_edges(e, k=2, weight_col="w").collect()
    }
    assert rows == {2: (1.25, 1), 3: (1.0, 2)}


def test_stats_skew_collapse(spark):
    hub = [(1, d) for d in range(2, 22)]  # out-degree 20
    tail = [(2, 3), (3, 4)]
    e = _edges(spark, hub + tail)
    row = sparsify_stats(e, top_k_out_edges(e, k=3)).collect()[0]
    assert row["n_edges"] == 22
    assert row["n_kept"] == 5  # 3 from the hub + the two singletons
    assert row["max_out_before"] == 20
    assert row["max_out_after"] == 3
    assert row["keep_frac"] == pytest.approx(5 / 22, abs=1e-8)


def test_plan_is_single_window_no_join(spark):
    e = _edges(spark, [(1, 2), (1, 3)])
    plan = top_k_out_edges(e, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_k_must_be_positive(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        top_k_out_edges(e, k=0)
