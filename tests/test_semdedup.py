"""SemDeDup semantic dedup (operators/semdedup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.operators.semdedup import assign_clusters, semdedup


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_greedy_keep_first(spark):
    # two well-separated clusters on the axes; ids 0/1/2 are near-identical
    # copies in cluster X (keep 0, drop 1 and 2); ids 10/11 orthogonal-ish in
    # cluster Y both survive a 0.95 threshold.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.998, -0.02, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.8, 0.6]),
    ]
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])], "cid int, cv array<double>"
    )
    out = {
        r["id"]: (r["cid"], r["keep"])
        for r in semdedup(_emb_df(spark, rows), threshold=0.95, centroids=cents).collect()
    }
    assert out[0] == (0, True)
    assert out[1] == (0, False)
    assert out[2] == (0, False)
    assert out[10] == (1, True)
    assert out[11] == (1, True)  # cos(10,11) = 0.8 < 0.95


def test_semdedup_cross_cluster_dups_not_compared(spark):
    # identical vectors forced into different clusters never see each other
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0])]
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])], "cid int, cv array<double>"
    )
    # id 0 -> cid 0, id 1 -> cid 0 too (same vector) — same cluster, dedups.
    out = {r["id"]: r["keep"] for r in
           semdedup(_emb_df(spark, rows), threshold=0.99, centroids=cents).collect()}
    assert out == {0: True, 1: False}


def test_semdedup_hot_cluster_guard_passthrough(spark):
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(10)]
    cents = spark.createDataFrame([(0, [1.0, 0.0])], "cid int, cv array<double>")
    guarded = semdedup(
        _emb_df(spark, rows), threshold=0.5, centroids=cents, max_cluster_size=5
    )
    # cluster has 10 > 5 members: passthrough, everything kept
    assert all(r["keep"] for r in guarded.collect())
    unguarded = semdedup(_emb_df(spark, rows), threshold=0.5, centroids=cents)
    assert sum(1 for r in unguarded.collect() if r["keep"]) == 1


def test_semdedup_kmeans_fed_and_invariant(spark):
    from amanogawa_spark.operators.kmeans import kmeans_centroids

    rows = [(i, [1.0 + (i % 3) * 0.01, float(i % 5)]) for i in range(40)]
    df = _emb_df(spark, rows)
    cents = kmeans_centroids(df, k=4, max_iter=5)
    a = semdedup(df, threshold=0.999, centroids=cents)
    b = semdedup(df.repartition(7), threshold=0.999, centroids=cents)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_assign_clusters_tie_breaks_to_smaller_cid(spark):
    rows = [(5, [1.0, 1.0])]
    cents = spark.createDataFrame(
        [(1, [2.0, 2.0]), (0, [1.0, 1.0])], "cid int, cv array<double>"
    )
    got = assign_clusters(_emb_df(spark, rows), centroids=cents).collect()
    assert got[0]["cid"] == 0


def test_arrow_method_agrees_with_expr(spark):
    # well-separated clusters: both methods must produce identical decisions
    rows = [
        (i, [1.0 + (i % 4) * 0.001, 0.0]) for i in range(20)
    ] + [(100 + i, [0.0, 1.0 + i * 0.001]) for i in range(10)]
    df = _emb_df(spark, rows)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cv array<double>"
    )
    a = semdedup(df, threshold=0.999, centroids=cents, method="expr")
    b = semdedup(df, threshold=0.999, centroids=cents, method="arrow")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_arrow_method_guard_passthrough(spark):
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(10)]
    cents = spark.createDataFrame([(0, [1.0, 0.0])], "cid int, cv array<double>")
    out = semdedup(
        _emb_df(spark, rows), threshold=0.5, centroids=cents,
        max_cluster_size=5, method="arrow",
    )
    assert all(r["keep"] for r in out.collect())


def test_assign_clusters_stride_miss_falls_back(spark):
    """No id divisible by the stride (sparse id space): the derived centroid
    table would be empty and the inner join would silently drop every row —
    the fallback seeds from the smallest ids instead (ADVICE r3)."""
    rows = [
        (1, [1.0, 0.0]),
        (3, [0.99, 0.1]),
        (7, [0.0, 1.0]),
    ]
    out = semdedup(_emb_df(spark, rows), threshold=0.999, stride=25)
    got = {r["id"]: r["keep"] for r in out.collect()}
    assert set(got) == {1, 3, 7}
    assert all(got.values())  # nothing near-identical at this threshold


def test_assign_clusters_arrow_stride_miss_falls_back(spark):
    from amanogawa_spark.operators.semdedup import assign_clusters_arrow

    rows = [(1, [1.0, 0.0]), (3, [0.0, 1.0])]
    out = assign_clusters_arrow(_emb_df(spark, rows), stride=25)
    assert {r["id"] for r in out.collect()} == {1, 3}


def test_assign_clusters_empty_centroids_raise(spark):
    import pytest

    from amanogawa_spark.operators.semdedup import assign_clusters_arrow

    df = _emb_df(spark, [(1, [1.0, 0.0])])
    empty = spark.createDataFrame([], "cid long, cv array<double>")
    with pytest.raises(ValueError):
        assign_clusters(df, centroids=empty)
    with pytest.raises(ValueError):
        assign_clusters_arrow(df, centroids=empty)


def test_assign_clusters_arrow_bounded_centroid_collect(spark):
    """The default (stride-derived) arrow centroid set is capped at
    max_centroids — the driver never holds an O(n/stride) table."""
    from amanogawa_spark.operators.semdedup import assign_clusters_arrow

    rows = [(i, [float(i % 7), 1.0]) for i in range(0, 400, 2)]
    out = assign_clusters_arrow(
        _emb_df(spark, rows), stride=2, max_centroids=5
    ).collect()
    assert len(out) == 200
    assert len({r["cid"] for r in out}) <= 5
    # the 5 kept centroids are the smallest stride-matching ids
    assert {r["cid"] for r in out} <= {0, 2, 4, 6, 8}
