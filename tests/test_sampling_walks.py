"""Deterministic sampling + random walks: invariance and structural checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.graph.walks import random_walks
from amanogawa_spark.operators.bow import tf_idf
from amanogawa_spark.operators.sampling import hash_sample, stratified_sample


def test_stratified_sample_sizes_and_invariance(spark):
    rows = [(i, f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "id long, grp string")
    s = stratified_sample(df, "grp", 7, ["id"])
    sizes = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"g0": 7, "g1": 7, "g2": 7}
    # small group: returns the whole group, not an error
    tiny = stratified_sample(df.filter(F.col("id") < 2), "grp", 7, ["id"])
    assert tiny.count() == 2
    # pure function of the data: repartitioning must not change the set
    s2 = stratified_sample(df.repartition(13), "grp", 7, ["id"])
    assert {tuple(r) for r in s.collect()} == {tuple(r) for r in s2.collect()}


def test_hash_sample_rate_and_determinism(spark):
    df = spark.range(0, 20_000).select(F.col("id"))
    kept = hash_sample(df, 0.2, ["id"])
    n = kept.count()
    assert abs(n / 20_000 - 0.2) < 0.02  # hash-uniformity sanity band
    assert kept.exceptAll(hash_sample(df.repartition(9), 0.2, ["id"])).count() == 0


def test_tfidf_known_values(spark):
    docs = [(0, "a b a"), (1, "a c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id, r.term): r for r in tf_idf(df).collect()}
    import math

    # 'a' in both docs: df=2, idf = ln(3/3)+1 = 1
    assert abs(got[(0, "a")].tf - 2 / 3) < 1e-12
    assert got[(0, "a")].df_count == 2
    assert abs(got[(0, "a")].tfidf - 2 / 3) < 1e-12
    # 'b' only in doc 0: df=1, idf = ln(3/2)+1
    assert abs(got[(0, "b")].tfidf - (1 / 3) * (math.log(1.5) + 1)) < 1e-12
    assert (1, "b") not in got


def test_random_walks_follow_edges(spark):
    """Every consecutive pair in a walk must be an edge; step 0 is the
    start; the corpus is repartition-invariant."""
    edges = [(i, (i * 3 + j) % 20) for i in range(20) for j in (1, 2, 3)]
    e = spark.createDataFrame(
        [(s, d) for s, d in edges if s != d], "src_id long, dst_id long"
    )
    w = random_walks(e, walk_length=4, walks_per_vertex=2)
    rows = w.collect()
    edge_set = {(s, d) for s, d in edges if s != d}
    by_walk: dict = {}
    for r in rows:
        by_walk.setdefault((r.start_id, r.walk_no), {})[r.step] = r.vertex_id
    assert len(by_walk) == e.select("src_id").distinct().count() * 2
    for (start, _), steps in by_walk.items():
        assert steps[0] == start
        for k in range(1, max(steps) + 1):
            assert (steps[k - 1], steps[k]) in edge_set
    w2 = random_walks(e.repartition(11), walk_length=4, walks_per_vertex=2)
    assert w.exceptAll(w2).count() == 0 and w2.exceptAll(w).count() == 0


def test_pack_sequences_exact_global_cumsum(spark):
    """The two-pass distributed cumsum equals the single-node reference:
    contiguous stream, correct (seq_id, seq_offset), repartition-invariant."""
    import hashlib

    from amanogawa_spark.operators.packing import pack_sequences

    rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_sequences(df, max_tokens=512, hash="md5").collect()
    }
    # single-node reference
    order = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    cum = 0
    for doc_id, toks in order:
        assert got[doc_id] == (cum // 512, cum % 512), doc_id
        cum += toks
    assert cum == sum(t for _, t in rows)
    got2 = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_sequences(df.repartition(17), max_tokens=512, hash="md5").collect()
    }
    assert got2 == got


def test_random_walks_node2vec_length(spark):
    """Length-25 walks (lineage-truncation regime) stay correct and fast:
    every transition is an edge; all walks reach full length on a graph
    with no dangling vertices."""
    import time

    edges = [(i, (i * 5 + j) % 60) for i in range(60) for j in (1, 2)]
    e = spark.createDataFrame(
        [(s, d) for s, d in edges if s != d], "src_id long, dst_id long"
    )
    t0 = time.time()
    w = random_walks(e, walk_length=25, walks_per_vertex=1)
    rows = w.collect()
    wall = time.time() - t0
    edge_set = {(s, d) for s, d in edges if s != d}
    by_walk: dict = {}
    for r in rows:
        by_walk.setdefault((r.start_id, r.walk_no), {})[r.step] = r.vertex_id
    for steps in by_walk.values():
        assert len(steps) == 26  # no dangling -> full length
        for k in range(1, 26):
            assert (steps[k - 1], steps[k]) in edge_set
    assert wall < 120, f"walk chain too slow: {wall:.0f}s"
