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

    # vertex-ID ordering vs adjacency compressibility (WebGraph/BV URL
    # ordering): 20k pages / 200 hosts, 80% intra-host links — compare
    # SURT-ordered dense ids vs randomly-ordered dense ids
    from amanogawa_spark.functions.url import surt_key
    from amanogawa_spark.graph.build import dense_rank_ids
    from amanogawa_spark.graph.compress import compression_summary

    n, hosts, deg = 20000, 200, 8
    erows = []
    for i in range(n):
        h = i % hosts
        for j in range(deg):
            r = (i * 2654435761 + j * 40503) % (1 << 32)
            if r % 5 < 4:
                t = h + hosts * ((r // 5) % (n // hosts))
            else:
                t = r % n
            if t != i:
                erows.append(
                    (
                        f"http://site{h}.example/p{i // hosts}",
                        f"http://site{t % hosts}.example/p{t // hosts}",
                    )
                )
    e_urls = spark.createDataFrame(erows, "src_url string, dst_url string")
    urls = (
        e_urls.select(F.col("src_url").alias("url"))
        .union(e_urls.select("dst_url"))
        .distinct()
    )
    v_surt = dense_rank_ids(
        urls.select(
            "url",
            F.concat_ws("\x01", surt_key(F.col("url")), F.col("url")).alias("_sk"),
        ),
        "_sk",
    ).select("url", "id")
    v_rand = dense_rank_ids(
        urls.withColumn("_hk", F.xxhash64("url")), "_hk"
    ).select("url", "id")
    for name, v in [("surt_dense", v_surt), ("random_dense", v_rand)]:
        e = (
            e_urls.join(
                v.select(F.col("url").alias("src_url"), F.col("id").alias("src_id")),
                "src_url",
            )
            .join(
                v.select(F.col("url").alias("dst_url"), F.col("id").alias("dst_id")),
                "dst_url",
            )
            .select("src_id", "dst_id")
        )
        r = compression_summary(e).collect()[0]
        print(
            json.dumps(
                {
                    "corpus": "weblike_20k_80pct_intrahost",
                    "id_order": name,
                    "n_links": r["n_links"],
                    "bits_per_link": r["bits_per_link"],
                    "compression_ratio": r["compression_ratio"],
                }
            )
        )


if __name__ == "__main__":
    main()
