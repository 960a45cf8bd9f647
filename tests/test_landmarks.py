"""Landmark distance sketches (graph/landmarks.py)."""

from __future__ import annotations

from amanogawa_spark.graph.landmarks import (
    estimate_distances,
    landmark_distances,
    select_landmarks,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id long, dst_id long")


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


PATH = [(0, 1), (1, 2), (2, 3), (3, 4)]  # path graph 0-1-2-3-4


def test_undirected_estimate_upper_bound_and_exact_on_landmark(spark):
    e = _edges(spark, _sym(PATH))
    d = landmark_distances(e, [2], max_rounds=8)
    pairs = spark.createDataFrame(
        [(u, v) for u in range(5) for v in range(5) if u != v], "u long, v long"
    )
    est = {(r["u"], r["v"]): r["dist_est"] for r in estimate_distances(d, pairs).collect()}
    true_d = {(u, v): abs(u - v) for u in range(5) for v in range(5) if u != v}
    # upper bound everywhere
    assert all(est[k] >= true_d[k] for k in est)
    # exact whenever the landmark (2) lies on the shortest path
    assert est[(1, 3)] == 2
    assert est[(0, 4)] == 4
    # slack when it doesn't: d(0,1)=1 but via landmark 2 it's 2+1=3
    assert est[(0, 1)] == 3


def test_directed_estimate_uses_reverse_sketch(spark):
    e = _edges(spark, [(0, 1), (1, 2)])  # chain 0 -> 1 -> 2
    d_rev = landmark_distances(e, [1], max_rounds=4, reverse=True)
    d_fwd = landmark_distances(e, [1], max_rounds=4)
    pairs = spark.createDataFrame([(0, 2), (2, 0)], "u long, v long")
    est = {
        (r["u"], r["v"]): r["dist_est"]
        for r in estimate_distances(d_rev, pairs, dists_to=d_fwd).collect()
    }
    assert est == {(0, 2): 2}  # (2,0) unreachable -> absent


def test_select_landmarks_degree_and_hash(spark):
    # star: 9 is the hub
    star = [(9, i) for i in range(5)] + [(i, 9) for i in range(5, 8)]
    e = _edges(spark, star)
    assert select_landmarks(e, n=1, method="degree") == [9]
    h1 = select_landmarks(e, n=3, method="hash")
    h2 = select_landmarks(e.repartition(5), n=3, method="hash")
    assert h1 == h2 and len(h1) == 3


def test_sketch_repartition_invariant(spark):
    e = _edges(spark, _sym(PATH))
    a = landmark_distances(e, [0, 2], max_rounds=8)
    b = landmark_distances(e.repartition(7), [0, 2], max_rounds=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
