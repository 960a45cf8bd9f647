"""Algorithm oracles for bipartite butterfly counting."""

from __future__ import annotations

from itertools import combinations

from amanogawa_spark.graph.butterflies import (
    butterfly_total,
    vertex_butterflies,
    wedge_codegrees,
)


def _brute(edges):
    """Reference butterfly census in pure python: (total, per_l_vertex)."""
    nbrs: dict[int, set[str]] = {}
    for l, r in edges:
        nbrs.setdefault(l, set()).add(r)
    total = 0
    per = dict.fromkeys(nbrs, 0)
    for a, b in combinations(sorted(nbrs), 2):
        c = len(nbrs[a] & nbrs[b])
        bf = c * (c - 1) // 2
        total += bf
        per[a] += bf
        per[b] += bf
    return total, per


def _df(spark, edges):
    return spark.createDataFrame(edges, "l long, r string")


def test_k22_is_one_butterfly(spark):
    e = _df(spark, [(1, "x"), (1, "y"), (2, "x"), (2, "y")])
    row = butterfly_total(e, side="r").collect()[0]
    assert row["n_butterflies"] == 1
    assert row["n_wedges"] == 2  # two term-centered wedges: x and y
    assert row["closed_wedge_frac"] == 1.0


def test_k33_and_side_invariance(spark):
    e = _df(spark, [(i, t) for i in (1, 2, 3) for t in ("x", "y", "z")])
    for side in ("l", "r"):
        row = butterfly_total(e, side=side).collect()[0]
        # C(3,2) pairs each sharing 3 centers -> 3 * C(3,2) = 9
        assert row["n_butterflies"] == 9
    # auto side picks one of the two and agrees on the invariant count
    assert butterfly_total(e, side="auto").collect()[0]["n_butterflies"] == 9


def test_matches_brute_force_on_random_bipartite(spark):
    import random

    rng = random.Random(11)
    edges = sorted(
        {(rng.randrange(30), f"t{rng.randrange(18)}") for _ in range(260)}
    )
    want_total, want_per = _brute(edges)
    e = _df(spark, edges)
    got = butterfly_total(e, l_col="l", r_col="r", side="r").collect()[0]
    assert got["n_butterflies"] == want_total
    per = {
        r["id"]: r["butterflies"]
        for r in vertex_butterflies(e, for_side="l").collect()
    }
    assert per == {k: v for k, v in want_per.items() if v > 0} | {
        k: 0 for k, v in want_per.items() if v == 0 and k in per
    }
    # every l vertex in >=1 codeg pair appears; counts match exactly
    for k, v in per.items():
        assert want_per[k] == v


def test_hot_center_guard_drops_quadratic_centers(spark):
    # term "hub" touches every doc; guarded counting excludes it
    edges = [(i, "hub") for i in range(10)] + [
        (0, "x"),
        (1, "x"),
        (0, "y"),
        (1, "y"),
    ]
    e = _df(spark, edges)
    unguarded = butterfly_total(e, side="r").collect()[0]["n_butterflies"]
    guarded = butterfly_total(e, side="r", max_center_degree=5).collect()[0]
    assert unguarded > guarded["n_butterflies"] == 1  # only x,y survive
    cd = wedge_codegrees(e, center="r", max_center_degree=5).collect()
    assert all(r["codeg"] <= 2 for r in cd)
