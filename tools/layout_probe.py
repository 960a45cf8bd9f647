"""Measure the similarity-ordered write layout's compression win.

Two corpora, same codec settings for both layouts of each:

1. the driver testdata ``documents`` table at ``--sf-dir`` (real text,
   planted near-duplicates), ordered by SimHash alone;
2. the deterministic Common-Crawl-style pages fixture (per-host template
   skeletons), ordered by (host, SimHash) — the web-archive case.

Prints one JSON line per corpus:
  {"corpus": ..., "rows": N, "scattered_bytes": ..., "clustered_bytes": ...,
   "ratio": ...}  (ratio < 1 = clustered layout is smaller)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.functions.url import host_of
    from amanogawa_spark.operators.ordering import (
        layout_size_probe,
        locality_sort_keys,
    )
    from amanogawa_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(cpus=cpus, shuffle_partitions=cpus)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    keyed = docs.join(
        locality_sort_keys(docs).select(F.col("id").alias("doc_id"), "sh"),
        "doc_id",
    )
    with tempfile.TemporaryDirectory() as td:
        p = layout_size_probe(keyed, ["sh", "doc_id"], td, num_partitions=cpus)
    print(json.dumps({"corpus": f"documents@{sf_dir}", "rows": docs.count(), **p}))

    pages = spark.createDataFrame(generate_pages(n_pages=20000, seed=11).pages)
    pg = (
        pages.withColumn("doc_id", F.xxhash64("url"))
        .withColumn("host", host_of(F.col("url")))
        .select("doc_id", "host", "url", "html", "text")
    )
    keyed = pg.join(
        locality_sort_keys(pg).select(F.col("id").alias("doc_id"), "sh"), "doc_id"
    )
    with tempfile.TemporaryDirectory() as td:
        p = layout_size_probe(keyed, ["host", "sh", "doc_id"], td, num_partitions=cpus)
    print(json.dumps({"corpus": "pages_fixture_20k_raw_crawl", "rows": pg.count(), **p}))

    # template-heavy corpus (the case the layout exists for): same-host
    # docs share a long non-self-repetitive skeleton, payload differs
    rows = []
    for i in range(20000):
        h = i % 400
        template = " ".join(f"h{h}w{(j * 37 + h * 101) % 9973}" for j in range(250))
        rows.append((i, f"site{h}.example,)/p{i}", template + f" payload {i * 7919}"))
    tdf = spark.createDataFrame(rows, "doc_id long, surt string, text string")
    keyed = tdf.join(
        locality_sort_keys(tdf, group_col="surt").select(
            F.col("id").alias("doc_id"), "sh"
        ),
        "doc_id",
    )
    with tempfile.TemporaryDirectory() as td:
        p = layout_size_probe(keyed, ["surt", "sh", "doc_id"], td, num_partitions=cpus)
    print(json.dumps({"corpus": "templated_20k_400hosts", "rows": 20000, **p}))


if __name__ == "__main__":
    main()
