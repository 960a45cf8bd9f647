"""Spinner balanced partitioning (graph/partition.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.graph.partition import edge_cut, spinner_partition


def _g(spark, pairs):
    ids = sorted({x for p in pairs for x in p})
    return (
        spark.createDataFrame([(i,) for i in ids], "id long"),
        spark.createDataFrame(pairs, "src_id long, dst_id long"),
    )


def _two_cliques(n=8, gap=100):
    pairs = [(a, b) for a in range(n) for b in range(n) if a < b]
    pairs += [(gap + a, gap + b) for a in range(n) for b in range(n) if a < b]
    pairs.append((0, gap))  # one bridge
    return pairs


def test_spinner_separates_cliques_and_balances(spark):
    v, e = _g(spark, _two_cliques())
    labels = spinner_partition(v, e, k=2, max_rounds=20, stop_moves_frac=0.01)
    got = {r["id"]: r["pid"] for r in labels.collect()}
    a = {got[i] for i in range(8)}
    b = {got[100 + i] for i in range(8)}
    # each clique ends up in ONE partition, and not the same one
    assert len(a) == 1 and len(b) == 1 and a != b
    cut = edge_cut(e, labels).collect()[0]
    assert cut["n_cut"] == 1  # only the bridge crosses
    assert cut["n_edges"] == e.count()


def test_spinner_balance_capacity_respected(spark):
    # a star would love to collapse into one partition; slack must prevent
    # everything piling up when k=2
    pairs = [(0, i) for i in range(1, 21)]
    v, e = _g(spark, pairs)
    labels = spinner_partition(v, e, k=2, max_rounds=8, balance_slack=1.1, stop_moves_frac=0.05)
    sizes = labels.groupBy("pid").count().collect()
    assert max(r["count"] for r in sizes) <= (21 // 2 + 1) * 1.1 + 1


def test_spinner_deterministic(spark):
    v, e = _g(spark, _two_cliques())
    a = sorted(map(tuple, spinner_partition(v, e, k=4, max_rounds=8, stop_moves_frac=0.05).collect()))
    b = sorted(map(tuple, spinner_partition(v, e.repartition(7), k=4, max_rounds=8, stop_moves_frac=0.05).collect()))
    assert a == b


def test_edge_cut_metric(spark):
    labels = spark.createDataFrame([(0, 0), (1, 0), (2, 1)], ["id", "pid"])
    e = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src_id long, dst_id long")
    row = edge_cut(e, labels).collect()[0]
    assert (row["n_edges"], row["n_cut"], row["cut_frac_r"]) == (3, 2, round(2 / 3, 8))


def test_multilevel_partition_ring_of_cliques(spark):
    from amanogawa_spark.graph.partition import multilevel_partition

    # 4 cliques of 6 in a ring — coarse structure a flat LPA resolves slowly
    pairs = []
    for c in range(4):
        base = c * 10
        pairs += [(base + a, base + b) for a in range(6) for b in range(6) if a < b]
    for c in range(4):
        pairs.append((c * 10, ((c + 1) % 4) * 10))  # ring bridges
    ids = sorted({x for p in pairs for x in p})
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(pairs, "src_id long, dst_id long")

    labels = multilevel_partition(v, e, k=4, levels=2, coarse_rounds=10,
                                  refine_rounds=2)
    got = {r["id"]: r["pid"] for r in labels.collect()}
    assert set(got) == set(ids)  # every vertex labeled exactly once
    # quality: each clique should be (near-)monochrome — allow 1 straggler
    for c in range(4):
        pids = [got[c * 10 + a] for a in range(6)]
        assert max(pids.count(p) for p in set(pids)) >= 5, (c, pids)
    cut = edge_cut(e, labels).collect()[0]
    assert cut["cut_frac_r"] <= 0.25  # 4 ring bridges + slack out of 64 edges


def test_spinner_round_weighted_equals_exploded_multigraph(spark):
    """A weighted adjacency scores identically to the same multigraph with
    multiplicity materialized as repeated rows (ADVICE r3: the explode
    blows up O(weight) rows per contracted hub edge)."""
    from amanogawa_spark.graph.partition import spinner_round

    wadj = spark.createDataFrame(
        [(0, 1, 3.0), (1, 0, 3.0), (1, 2, 1.0), (2, 1, 1.0),
         (2, 3, 5.0), (3, 2, 5.0), (0, 3, 1.0), (3, 0, 1.0)],
        "u long, v long, weight double",
    )
    exploded = wadj.selectExpr("u", "v", "explode(sequence(1, cast(weight as int)))") \
                   .select("u", "v")
    labels = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 0), (3, 1)], ["id", "pid"]
    )
    a = {(r["id"], r["pid"])
         for r in spinner_round(labels, wadj, k=2, round_idx=1, capacity=3.0).collect()}
    b = {(r["id"], r["pid"])
         for r in spinner_round(labels, exploded, k=2, round_idx=1, capacity=3.0).collect()}
    assert a == b


def test_contract_matching_composes_weights(spark):
    """Contracting an already-weighted coarse graph sums the carried
    weights — level-2 weights are true fine-edge multiplicities."""
    from amanogawa_spark.graph.matching import contract_matching

    e = spark.createDataFrame(
        [(0, 2, 3), (1, 2, 4), (0, 1, 7)],
        "src_id long, dst_id long, weight long",
    )
    m = spark.createDataFrame([(0, 1)], ["u", "v"])  # collapse 0,1 -> 0
    got = {(r["src_id"], r["dst_id"]): r["weight"]
           for r in contract_matching(e, m).collect()}
    assert got == {(0, 2): 7}  # 3 + 4; the intra-pair edge (w=7) drops


def _many_communities(n_comm=12, size=5):
    # n_comm disjoint cliques, no bridges: LPA recovers each exactly
    pairs = []
    for c in range(n_comm):
        base = c * 1000
        pairs += [
            (base + a, base + b) for a in range(size) for b in range(size) if a < b
        ]
    return pairs


def test_community_partition_head_budget_bounds_collect(spark):
    """head_row_budget caps the driver collect: with 12 communities and a
    budget of 3 only the 3 largest are exactly packed; the other 9 are
    hash-binned in-plan, whole community per bin, and every vertex still
    gets exactly one pid in [0, k)."""
    from amanogawa_spark.graph.partition import community_partition

    v, e = _g(spark, _many_communities())
    out = community_partition(v, e, k=4, lpa_rounds=4, head_row_budget=3)
    rows = out.collect()
    assert len(rows) == v.count()  # one assignment per vertex, none lost
    assert all(0 <= r["pid"] < 4 for r in rows)
    # whole communities stay together (tail hash is per-label)
    by_comm = {}
    for r in rows:
        by_comm.setdefault(r["id"] // 1000, set()).add(r["pid"])
    assert all(len(pids) == 1 for pids in by_comm.values())


def test_community_partition_budget_at_least_ncomm_matches_unbounded(spark):
    from amanogawa_spark.graph.partition import community_partition

    v, e = _g(spark, _many_communities(n_comm=6))
    a = sorted(
        tuple(r)
        for r in community_partition(
            v, e, k=3, lpa_rounds=4, head_row_budget=100_000
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in community_partition(
            v, e, k=3, lpa_rounds=4, head_row_budget=6
        ).collect()
    )
    assert a == b


def test_community_partition_head_collect_is_take_ordered(spark):
    """The head derivation must compile to a TakeOrdered (bounded driver
    rows), never a full sort+collect."""
    v, e = _g(spark, _many_communities(n_comm=4))
    from amanogawa_spark.graph.lpa import label_propagation

    labels = label_propagation(v.select("id"), e, max_rounds=2)
    sizes_df = labels.groupBy("label").agg(F.count("*").alias("cnt"))
    plan = (
        sizes_df.orderBy(F.desc("cnt"), F.asc("label"))
        .limit(3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
