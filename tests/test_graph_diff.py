"""Recrawl graph diffs (graph/diff.py)."""

from __future__ import annotations

from amanogawa_spark.graph.diff import degree_deltas, diff_summary, edge_diff


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "src_id long, dst_id long")


def test_edge_diff_classification(spark):
    old = _e(spark, [(0, 1), (1, 2), (2, 3)])
    new = _e(spark, [(0, 1), (2, 3), (3, 4), (4, 5)])
    got = sorted(tuple(r) for r in edge_diff(old, new).collect())
    assert got == [(1, 2, "removed"), (3, 4, "added"), (4, 5, "added")]


def test_edge_diff_duplicate_insensitive(spark):
    old = _e(spark, [(0, 1), (0, 1)])
    new = _e(spark, [(0, 1), (0, 1), (0, 1), (1, 2)])
    got = sorted(tuple(r) for r in edge_diff(old, new).collect())
    assert got == [(1, 2, "added")]


def test_degree_deltas_only_changed(spark):
    old = _e(spark, [(0, 1), (1, 2)])
    new = _e(spark, [(0, 1), (0, 2)])  # removed 1->2, added 0->2
    got = {r["id"]: (r["out_delta"], r["in_delta"]) for r in degree_deltas(old, new).collect()}
    assert got == {0: (1, 0), 1: (-1, 0)}  # vertex 2: in -1 +1 = 0 -> omitted


def test_diff_summary_churn(spark):
    old = _e(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    new = _e(spark, [(0, 1), (1, 2), (5, 6)])
    row = diff_summary(old, new).collect()[0]
    assert (row["n_added"], row["n_removed"], row["n_unchanged"]) == (1, 2, 2)
    assert row["churn_r"] == 1.0  # (1+2)/(1+2)


def test_identical_snapshots_empty_diff(spark):
    e = _e(spark, [(0, 1), (1, 2)])
    assert edge_diff(e, e).count() == 0
    assert degree_deltas(e, e).count() == 0
    row = diff_summary(e, e).collect()[0]
    assert (row["n_added"], row["n_removed"], row["n_unchanged"], row["churn_r"]) == (0, 0, 2, 0.0)
