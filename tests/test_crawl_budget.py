"""Algorithm oracles for crawl-budget apportionment."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.graph.frontier import crawl_budget


def _mass(spark, rows):
    return spark.createDataFrame(rows, "host string, mass long")


def test_quotas_sum_exactly_to_budget(spark):
    m = _mass(spark, [("a", 7), ("b", 11), ("c", 3), ("d", 29), ("e", 1)])
    out = crawl_budget(m, budget=1000)
    assert out.agg(F.sum("quota")).collect()[0][0] == 1000


def test_quota_within_one_of_proportional_share(spark):
    rows = [(f"h{i}", (i * 13) % 50 + 1) for i in range(40)]
    total = sum(m for _, m in rows)
    budget = 997
    got = {r["host"]: r["quota"] for r in crawl_budget(_mass(spark, rows), budget).collect()}
    assert sum(got.values()) == budget
    for h, m in rows:
        share = m / total * budget
        assert share - 1 < got[h] < share + 1


def test_matches_python_largest_remainder(spark):
    import math

    rows = [("x", 5), ("y", 5), ("z", 5), ("w", 2)]
    budget = 10
    total = 17
    shares = {h: m / total * budget for h, m in rows}
    base = {h: math.floor(s) for h, s in shares.items()}
    extra = budget - sum(base.values())
    order = sorted(rows, key=lambda r: (-(shares[r[0]] - base[r[0]]), r[0]))
    want = dict(base)
    for h, _ in order[:extra]:
        want[h] += 1
    got = {r["host"]: r["quota"] for r in crawl_budget(_mass(spark, rows), budget).collect()}
    assert got == want


def test_repartition_invariance(spark):
    rows = [(f"h{i}", i % 7 + 1) for i in range(30)]
    a = {r["host"]: r["quota"] for r in crawl_budget(_mass(spark, rows), 500).collect()}
    b = {
        r["host"]: r["quota"]
        for r in crawl_budget(_mass(spark, rows).repartition(9), 500).collect()
    }
    assert a == b
