"""Algorithm oracles for Weisfeiler-Lehman label refinement."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from amanogawa_spark.graph.wl import wl_class_sizes, wl_labels


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_id long, dst_id long")


def _partition(rows):
    """Map label -> frozenset of ids (the refinement partition)."""
    by = {}
    for r in rows:
        by.setdefault(r["wl_label"], set()).add(r["id"])
    return {frozenset(v) for v in by.values()}


def test_path_graph_distinguishes_positions(spark):
    # 0 -> 1 -> 2 -> 3: after 2 rounds all four are structurally distinct
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    rows = wl_labels(e, rounds=2).collect()
    assert len({r["wl_label"] for r in rows}) == 4


def test_isomorphic_components_share_labels(spark):
    # two disjoint copies of the same asymmetric component -> identical
    # label multisets across the copies (0->1->2, 0->2: three distinct roles)
    comp = [(0, 1), (1, 2), (0, 2)]
    iso = [(a + 10, b + 10) for a, b in comp]
    rows = wl_labels(_edges(spark, comp + iso), rounds=3).collect()
    counts = Counter(r["wl_label"] for r in rows)
    assert len(counts) == 3  # the three roles, shared across copies
    assert all(c == 2 for c in counts.values())


def test_rounds_zero_is_degree_classes(spark):
    e = _edges(spark, [(0, 1), (0, 2), (3, 1)])
    rows = wl_labels(e, rounds=0).collect()
    lab = {r["id"]: r["wl_label"] for r in rows}
    # 1 has in=2,out=0; 2 has in=1,out=0; 0 has out=2; 3 has out=1
    assert lab[0] != lab[3] and lab[1] != lab[2] and lab[0] != lab[1]


def test_sum_mode_induces_same_partition_as_sorted(spark):
    import random

    rng = random.Random(5)
    pairs = sorted({(rng.randrange(24), rng.randrange(24)) for _ in range(70)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    p_sorted = _partition(wl_labels(e, rounds=2, agg="sorted").collect())
    p_sum = _partition(wl_labels(e, rounds=2, agg="sum").collect())
    assert p_sorted == p_sum


def test_class_sizes_sum_to_vertex_count(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    total = (
        wl_class_sizes(e, rounds=2)
        .agg(F.sum("n_vertices").alias("s"))
        .collect()[0]["s"]
    )
    assert total == 4
