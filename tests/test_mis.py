"""Luby maximal-independent-set oracles.

Independent checks: independence (no edge joins two members), maximality
(every non-member has a member neighbour), isolated-vertex inclusion,
determinism under repartitioning, and a pure-Python mirror of the
round-0 winner rule (the same kernel the driver's DuckDB oracle mirrors
in ``q_mis1``).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from amanogawa_spark.graph.components import _symmetrize
from amanogawa_spark.graph.mis import luby_mis, mis_round_winners


def _ring_graph(spark, n=40):
    edges = [(i, (i + 1) % n) for i in range(n)]
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    v = spark.range(n).withColumnRenamed("id", "id")
    return v, e


def _random_graph(spark, n=200, seed=3):
    # deterministic pseudo-random sparse graph + a few isolated vertices
    edges = []
    for i in range(n):
        for k in range(3):
            j = int(hashlib.md5(f"{seed}:{i}:{k}".encode()).hexdigest(), 16) % n
            if i != j:
                edges.append((i, j))
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    v = spark.range(n + 5).select(F.col("id"))  # ids n..n+4 are isolated
    return v, e


def test_mis_independent_and_maximal(spark):
    v, e = _random_graph(spark)
    res = luby_mis(v, e, seed=0).persist()
    members = res.filter("in_mis")

    # independence: no symmetric edge connects two members
    adj = _symmetrize(e)
    both = (
        adj.join(members.select(F.col("id").alias("u")), "u", "semi")
        .join(members.select(F.col("id").alias("v")), "v", "semi")
    )
    assert both.count() == 0

    # maximality: every non-member has at least one member neighbour
    nonmember = res.filter(~F.col("in_mis")).select("id")
    covered = (
        adj.join(members.select(F.col("id").alias("u")), "u", "semi")
        .select(F.col("v").alias("id"))
        .distinct()
    )
    uncovered = nonmember.join(covered, "id", "anti")
    assert uncovered.count() == 0

    # isolated vertices are always members (selected in round 0)
    iso = res.filter(F.col("id") >= 200).collect()
    assert all(r.in_mis and r.mis_round == 0 for r in iso)
    res.unpersist()


def test_mis_round0_matches_python_mirror(spark):
    v, e = _ring_graph(spark, 20)
    adj = _symmetrize(e)
    got = {r.id for r in mis_round_winners(v, adj, seed=0, round_no=0).collect()}

    def pri(i):
        return hashlib.md5(f"0:0:{i}".encode()).hexdigest() + str(i).zfill(12)

    expect = {
        i for i in range(20)
        if all(pri(i) < pri(j) for j in ((i - 1) % 20, (i + 1) % 20))
    }
    assert got == expect and got


def test_mis_repartition_invariant(spark):
    v, e = _random_graph(spark, n=120, seed=9)
    a = luby_mis(v, e, seed=1)
    b = luby_mis(
        v.repartition(7), e.repartition(11), seed=1
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
