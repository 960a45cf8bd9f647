"""Physical-plan audits for the round-4 sixth-session operators.

Locks in the scale properties the docstrings claim: CDC chunking and
winnowing are exchange-free map stages; the PCA moments pass shuffles
only partition partials (never raw vectors); crawl-budget ranking never
funnels hosts through a single partition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"some text body number {i} with enough words to chunk") for i in range(50)],
        "doc_id long, text string",
    )


def test_cdc_chunks_is_exchange_free(spark, docs):
    from amanogawa_spark.operators.chunking import cdc_chunks

    plan = _plan(cdc_chunks(docs, hash="xxhash64"))
    assert "Exchange" not in plan  # pure map: scan -> generate -> project


def test_winnow_fingerprints_is_exchange_free(spark, docs):
    from amanogawa_spark.operators.dedup import winnow_fingerprints

    plan = _plan(winnow_fingerprints(docs, hash="xxhash64"))
    assert "Exchange" not in plan


def test_pca_partials_never_shuffle_vectors(spark):
    from amanogawa_spark.operators.pca import gram_stats

    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    df = gram_stats(emb)
    df.collect()
    plan = _plan(df)
    # the embedding column must be consumed by the Python map stage and
    # never appear in an Exchange's output schema
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "embedding" not in line


def test_crawl_budget_no_single_partition_exchange(spark):
    from amanogawa_spark.graph.frontier import crawl_budget

    mass = spark.createDataFrame(
        [(f"h{i}", i % 9 + 1) for i in range(200)], "host string, mass long"
    )
    out = crawl_budget(mass, budget=5000)
    out.count()
    plan = _plan(out)
    # rangepartitioning for the remainder rank is fine; a SinglePartition
    # exchange carrying the host rows is NOT (only the final tiny
    # aggregate scalars may single-partition)
    bad = [
        l
        for l in plan.splitlines()
        if "Exchange SinglePartition" in l and "host" in l
    ]
    assert not bad


def test_butterfly_guard_filters_before_join(spark):
    from amanogawa_spark.graph.butterflies import wedge_codegrees

    e = spark.createDataFrame(
        [(i % 10, f"t{i % 7}") for i in range(60)], "l long, r string"
    )
    plan = _plan(wedge_codegrees(e, max_center_degree=5))
    # the degree filter must appear below the wedge self-join (semi join
    # against the kept-center set)
    assert "LeftSemi" in plan
