"""Co-citation / bibliographic coupling oracles: hand-computed counts,
hub-guard semantics, and top-k determinism."""

from __future__ import annotations

from amanogawa_spark.graph.cocitation import bibliographic_coupling, cocitation


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_id long, dst_id long")


def test_cocitation_hand_computed(spark):
    # s1 cites a,b,c; s2 and s3 cite a,b  =>  cocite(a,b)=3, (a,c)=(b,c)=1
    e = _edges(
        spark,
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10), (3, 11)],
    )
    got = {(r.id_a, r.id_b): r.cocite for r in cocitation(e, min_count=1).collect()}
    assert got == {(10, 11): 3, (10, 12): 1, (11, 12): 1}
    assert {(r.id_a, r.id_b) for r in cocitation(e, min_count=2).collect()} == {(10, 11)}


def test_cocitation_hub_guard_drops_big_sources(spark):
    e = _edges(
        spark,
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10), (3, 11)],
    )
    # cap 2 drops source 1 (out-degree 3): pair (10,11) now counted twice
    got = {
        (r.id_a, r.id_b): r.cocite
        for r in cocitation(e, min_count=1, max_out_degree=2).collect()
    }
    assert got == {(10, 11): 2}


def test_coupling_is_cocitation_of_reversed_graph(spark):
    rows = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (2, 12)]
    e = _edges(spark, rows)
    rev = _edges(spark, [(d, s) for s, d in rows])
    a = sorted(map(tuple, bibliographic_coupling(e, min_count=1).collect()))
    b = sorted(map(tuple, cocitation(rev, min_count=1).collect()))
    assert a == b and a


def test_topk_deterministic_under_repartition(spark):
    rows = [(s, (s * 7 + k) % 23) for s in range(40) for k in range(5)]
    e = _edges(spark, [(s, d) for s, d in rows if s != d])
    a = cocitation(e, min_count=1, k=15).collect()
    b = cocitation(e.repartition(13), min_count=1, k=15).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
