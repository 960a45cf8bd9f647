"""Similarity-ordered layout (operators/ordering.py): sort-key assembly,
range-clustered partition sortedness, and a measured compression win on a
templated corpus (the falsifiable claim behind the heuristic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amanogawa_spark.operators.ordering import (
    clustered,
    layout_size_probe,
    locality_sort_keys,
)


def _templated_corpus(spark, n=600, hosts=100, words=200):
    """Near-duplicate template pages: same-host docs share a long NON-self-
    repetitive template body (distinct pseudo-words, so within-row
    compression can't exploit it) and differ only in a short payload — the
    cross-row redundancy only an adjacent layout lets the codec see."""
    rows = []
    for i in range(n):
        h = i % hosts
        template = " ".join(f"h{h}w{(j * 37 + h * 101) % 9973}" for j in range(words))
        rows.append((i, f"site{h}.example,)/page{i}", template + f" payload {i * 7919}"))
    return spark.createDataFrame(rows, "doc_id long, surt string, text string")


def test_locality_keys_shape_and_join(spark):
    df = _templated_corpus(spark, n=60)
    keys = locality_sort_keys(df, group_col="surt")
    assert keys.columns == ["id", "group", "sh"]
    assert keys.count() == 60
    # same-host template docs share most simhash bits: group-major order
    # puts them adjacent regardless
    assert keys.filter(F.col("sh").isNull()).count() == 0


def test_clustered_partitions_are_sorted(spark):
    df = _templated_corpus(spark, n=200)
    keys = locality_sort_keys(df, group_col="surt")
    laid = clustered(keys, ["group", "sh", "id"], num_partitions=5)

    def _check(it):
        prev = None
        for row in it:
            k = (row["group"], row["sh"], row["id"])
            assert prev is None or k >= prev, (prev, k)
            prev = k
            yield row

    assert laid.rdd.mapPartitions(lambda it: _check(it)).count() == 200


def test_clustered_layout_compresses_better(spark, tmp_path):
    df = _templated_corpus(spark, n=1000)
    keyed = df.join(
        locality_sort_keys(df, group_col="surt").select(
            F.col("id").alias("doc_id"), "sh"
        ),
        "doc_id",
    )
    probe = layout_size_probe(
        keyed, ["surt", "sh", "doc_id"], str(tmp_path), num_partitions=6
    )
    assert probe["scattered_bytes"] > 0 and probe["clustered_bytes"] > 0
    # templated same-host pages in the same row groups: a real win, not
    # noise (measured ~0.28 on this corpus; wide margin for codec drift)
    assert probe["ratio"] < 0.6, probe


def test_clustered_preserves_rows(spark):
    df = _templated_corpus(spark, n=150)
    laid = clustered(df, ["surt", "doc_id"], num_partitions=4)
    assert sorted(r["doc_id"] for r in laid.collect()) == list(range(150))
