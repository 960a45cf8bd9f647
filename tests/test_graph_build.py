"""Vertex dictionary + edge table construction invariants (FIXTURES.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.graph.build import build_edges, build_vertices, degrees


def test_vertices_dense_bijective(spark, corpus, pages_df):
    v = build_vertices(pages_df).collect()
    ids = sorted(r.id for r in v)
    assert ids == list(range(len(corpus.pages)))
    assert len({r.url for r in v}) == len(v)


def test_vertices_invariant_under_repartitioning(spark, pages_df):
    a = {(r.url, r.id) for r in build_vertices(pages_df.repartition(1)).collect()}
    b = {(r.url, r.id) for r in build_vertices(pages_df.repartition(17)).collect()}
    assert a == b


def test_vertices_hash_mode_no_collisions(spark, pages_df):
    v = build_vertices(pages_df, id_mode="hash")
    assert v.select("id").distinct().count() == v.count()


def test_edges_exact_vs_planted(spark, corpus, pages_df):
    v = build_vertices(pages_df)
    url_to_id = {r.url: r.id for r in v.collect()}
    got = {(r.src_id, r.dst_id) for r in build_edges(pages_df, v).collect()}
    expected = {(url_to_id[s], url_to_id[d]) for s, d in corpus.expected_edges}
    assert got == expected
    # no self loops
    assert all(s != d for s, d in got)


def test_degrees(spark, corpus, pages_df):
    v = build_vertices(pages_df)
    e = build_edges(pages_df, v)
    d = degrees(e)
    total_out = d.agg(F.sum("out_degree")).collect()[0][0]
    total_in = d.agg(F.sum("in_degree")).collect()[0][0]
    assert total_out == total_in == len(corpus.expected_edges)


def test_freshness_weights_decay_and_determinism(spark):
    from amanogawa_spark.graph.build import freshness_weights
    import pytest as _pytest
    from pyspark.sql import functions as F

    base = 1_700_000_000.0
    e = spark.createDataFrame(
        [(1, 2, base), (3, 4, base - 10 * 86400.0), (5, 6, base - 30 * 86400.0)],
        "src_id long, dst_id long, ts double",
    ).withColumn("warc_ts", F.timestamp_seconds("ts"))
    out = {
        r["src_id"]: r["weight"]
        for r in freshness_weights(
            e, now=base, half_life_days=10.0
        ).collect()
    }
    assert abs(out[1] - 1.0) < 1e-12          # age 0: full weight
    assert abs(out[3] - 0.5) < 1e-12          # one half-life
    assert abs(out[5] - 0.125) < 1e-12        # three half-lives
    with _pytest.raises(ValueError):
        freshness_weights(e)  # implicit wall-clock now is forbidden


def test_surt_id_mode_dense_invariant_and_compresses_better(spark):
    """id_mode='surt': dense 0..N-1 ids in SURT order, repartition-
    invariant, and the gap-encoded adjacency beats hash ids (the
    WebGraph/BV URL-ordering effect) on the fixture graph."""
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices
    from amanogawa_spark.graph.compress import compression_summary

    pages = spark.createDataFrame(generate_pages(n_pages=400, seed=3).pages)

    v_surt = build_vertices(pages, id_mode="surt")
    ids = sorted(r["id"] for r in v_surt.collect())
    assert ids == list(range(len(ids)))  # dense 0..N-1

    again = {
        r["url"]: r["id"]
        for r in build_vertices(pages.repartition(7), id_mode="surt").collect()
    }
    assert {r["url"]: r["id"] for r in v_surt.collect()} == again

    # same-host urls get contiguous ids: ranges per host never interleave
    from amanogawa_spark.functions.url import host_of
    from pyspark.sql import functions as F

    spans = (
        v_surt.withColumn("host", host_of(F.col("url")))
        .groupBy("host")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    for r in spans:
        assert r["hi"] - r["lo"] + 1 == r["n"], r

    # equal-bit-budget baseline: dense ids in RANDOM (hash) order, plus
    # the raw xxhash64 dictionary (worst case; exercises the try_subtract
    # overflow guard in adjacency_gap_bits)
    from amanogawa_spark.graph.build import dense_rank_ids

    urls = pages.select("url").distinct()
    v_rand = dense_rank_ids(
        urls.withColumn("_hk", F.xxhash64("url")), "_hk"
    ).select("url", "id")
    v_hash = build_vertices(pages, id_mode="hash")
    bits = {}
    for name, v in [("surt", v_surt), ("rand", v_rand), ("hash", v_hash)]:
        e = build_edges(pages, v)
        bits[name] = compression_summary(e).collect()[0]["bits_per_link"]
    assert bits["surt"] < bits["rand"] < bits["hash"], bits
