"""tools/run_analytics_job.py: the spark-submit analytics surface."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(argv, capsys):
    spec = importlib.util.spec_from_file_location(
        "run_analytics_job", REPO / "tools" / "run_analytics_job.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["run_analytics_job.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads([l for l in out if l.startswith("{")][-1])


def test_analytics_cli_algos(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices

    pages = spark.createDataFrame(generate_pages(n_pages=150, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    g = str(tmp_path / "g")

    n_verts = v.count()
    meta = _run(["--graph", g, "--algo", "cc", "--out", f"{g}/cc"], capsys)
    assert meta["rows"] == n_verts
    cc = spark.read.parquet(f"{g}/cc")
    assert cc.select("component").distinct().count() >= 2  # planted components

    meta = _run(["--graph", g, "--algo", "coloring", "--out", f"{g}/col"], capsys)
    assert meta["rows"] == n_verts

    meta = _run(
        ["--graph", g, "--algo", "salsa", "--out", f"{g}/salsa", "--max-iter", "3"],
        capsys,
    )
    assert meta["rows"] == n_verts and meta["iterations"] == 3

    meta = _run(
        ["--graph", g, "--algo", "node2vec", "--out", f"{g}/n2v", "--k", "2",
         "--p", "2.0", "--q", "0.5"],
        capsys,
    )
    assert meta["rows"] > n_verts  # steps 0..2 per walking vertex


def test_analytics_cli_sgns_and_neighbor_agg(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(generate_pages(n_pages=120, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    v.select(
        "id", F.array(F.col("id").cast("double"), F.lit(1.0)).alias("vec")
    ).write.mode("overwrite").parquet(str(tmp_path / "g" / "features"))
    g = str(tmp_path / "g")

    meta = _run(
        ["--graph", g, "--algo", "sgns_pairs", "--out", f"{g}/sgns", "--k", "3"],
        capsys,
    )
    out = spark.read.parquet(f"{g}/sgns")
    kinds = {r["pair_type"] for r in out.select("pair_type").distinct().collect()}
    assert kinds == {"pos", "neg"} and meta["rows"] == out.count() > 0

    meta = _run(
        ["--graph", g, "--algo", "neighbor_agg", "--out", f"{g}/nagg", "--k", "2"],
        capsys,
    )
    assert meta["rows"] == v.count()


def test_analytics_cli_condensation_and_local_cluster(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(generate_pages(n_pages=120, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    v.select("id").limit(2).write.mode("overwrite").parquet(
        str(tmp_path / "g" / "seeds")
    )
    g = str(tmp_path / "g")

    meta = _run(
        ["--graph", g, "--algo", "condensation_levels", "--out", f"{g}/cond"],
        capsys,
    )
    cond = spark.read.parquet(f"{g}/cond")
    # one row per SCC, member counts conserve |V|, sources sit at level 0
    assert meta["rows"] == cond.count() > 0
    assert cond.agg(F.sum("n_members")).collect()[0][0] == v.count()
    assert cond.agg(F.min("level")).collect()[0][0] == 0

    meta = _run(
        ["--graph", g, "--algo", "local_cluster", "--out", f"{g}/lc",
         "--tol", "1e-7", "--max-iter", "20"],
        capsys,
    )
    lc = spark.read.parquet(f"{g}/lc")
    assert meta["rows"] == lc.count() > 0
    # the cluster is a sweep prefix: ranks are exactly 1..n
    ks = sorted(r["sweep_k"] for r in lc.select("sweep_k").collect())
    assert ks == list(range(1, len(ks) + 1))


def test_analytics_cli_local_cluster_batch_dispatch(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(generate_pages(n_pages=100, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    # seeds WITH query_id: batched path
    v.select("id").limit(4).withColumn(
        "query_id", (F.col("id") % 2).cast("long")
    ).write.mode("overwrite").parquet(str(tmp_path / "g" / "seeds"))
    g = str(tmp_path / "g")

    meta = _run(
        ["--graph", g, "--algo", "local_cluster", "--out", f"{g}/lcb",
         "--tol", "1e-6", "--max-iter", "10"],
        capsys,
    )
    out = spark.read.parquet(f"{g}/lcb")
    assert "query_id" in out.columns and meta["rows"] == out.count() > 0
    # each query's cluster is a contiguous sweep prefix
    for q in [r["query_id"] for r in out.select("query_id").distinct().collect()]:
        ks = sorted(
            r["sweep_k"] for r in out.filter(F.col("query_id") == q).collect()
        )
        assert ks == list(range(1, len(ks) + 1)), (q, ks)


def test_analytics_cli_ego(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(generate_pages(n_pages=100, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    v.select("id").limit(2).write.mode("overwrite").parquet(
        str(tmp_path / "g" / "seeds")
    )
    g = str(tmp_path / "g")

    meta = _run(
        ["--graph", g, "--algo", "ego", "--out", f"{g}/ego", "--k", "2"],
        capsys,
    )
    out = spark.read.parquet(f"{g}/ego")
    assert meta["rows"] == out.count() > 0
    assert out.agg(F.max("src_hops")).collect()[0][0] <= 2
    assert out.agg(F.max("dst_hops")).collect()[0][0] <= 2


def test_analytics_cli_diameter(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices

    pages = spark.createDataFrame(generate_pages(n_pages=100, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    g = str(tmp_path / "g")

    meta = _run(
        ["--graph", g, "--algo", "diameter", "--out", f"{g}/diam"], capsys
    )
    assert meta["rows"] == 1
    row = spark.read.parquet(f"{g}/diam").collect()[0]
    assert row["diameter_lb"] >= row["ecc_start"] >= 1


def test_analytics_cli_mc_pagerank_and_gini(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices

    pages = spark.createDataFrame(generate_pages(n_pages=100, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    g = str(tmp_path / "g")

    meta = _run(
        ["--graph", g, "--algo", "mc_pagerank", "--out", f"{g}/mc",
         "--k", "2", "--max-iter", "6"],
        capsys,
    )
    # contract: ranks cover the EDGE graph's vertex set (src ∪ dst) —
    # fully isolated vertices carry no link signal
    n_verts = (
        e.selectExpr("src_id AS id").union(e.selectExpr("dst_id AS id")).distinct().count()
    )
    assert meta["rows"] == n_verts
    mc = spark.read.parquet(f"{g}/mc")
    assert set(mc.columns) == {"id", "visits", "pr_est"}
    # every vertex carries at least its own start visits
    assert mc.filter("visits < 2").count() == 0

    meta = _run(
        ["--graph", g, "--algo", "degree_gini", "--out", f"{g}/gini"], capsys
    )
    assert meta["rows"] == 1
    row = spark.read.parquet(f"{g}/gini").collect()[0]
    assert 0.0 <= row["gini_r"] <= 1.0
    assert row["top10pct_share_r"] >= 0.10 - 1e-9


def test_analytics_cli_partition_modes(spark, tmp_path, capsys):
    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices

    pages = spark.createDataFrame(generate_pages(n_pages=150, seed=7).pages)
    v = build_vertices(pages)
    e = build_edges(pages, v)
    v.write.mode("overwrite").parquet(str(tmp_path / "g" / "vertices"))
    e.write.mode("overwrite").parquet(str(tmp_path / "g" / "edges"))
    g = str(tmp_path / "g")
    n_verts = v.count()

    # default partitioner = community_partition
    meta = _run(
        ["--graph", g, "--algo", "partition", "--out", f"{g}/part", "--k", "4"],
        capsys,
    )
    assert meta["rows"] == n_verts and 0.0 <= meta["cut_frac"] <= 1.0
    part = spark.read.parquet(f"{g}/part")
    pids = {r["pid"] for r in part.select("pid").distinct().collect()}
    assert pids <= set(range(4))

    # flat spinner kept as the explicit refinement-kernel mode
    meta = _run(
        ["--graph", g, "--algo", "partition_spinner", "--out", f"{g}/parts",
         "--k", "4", "--max-iter", "4"],
        capsys,
    )
    assert meta["rows"] == n_verts and 0.0 <= meta["cut_frac"] <= 1.0
