"""The shipped examples/ configs run end-to-end against generated inputs
(copied into a tmp dir so example-relative paths resolve)."""

from __future__ import annotations

import shutil
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _stage(tmp_path, name):
    shutil.copy(REPO / "examples" / name, tmp_path / name)
    return str(tmp_path / name)


def test_example_simple_and_curation(spark, tmp_path):
    docs = "\n".join(
        f'{{"doc_id": {i}, "text": "alpha beta gamma delta line", "n_tokens": 5}}'
        for i in range(40)
    )
    (tmp_path / "docs.jsonl").write_text(docs + "\n")
    from amanogawa_spark.plans.config import run_config

    run_config(_stage(tmp_path, "simple.toml"), spark)
    assert spark.read.csv(str(tmp_path / "out_copy"), header=True).count() == 40

    run_config(_stage(tmp_path, "curation.toml"), spark)
    out = spark.read.csv(str(tmp_path / "out_packed"), header=True)
    # hash sample ~half -> exact dedup collapses identical text to 1 doc
    assert out.count() == 1
    assert {"seq_id", "seq_offset"} <= set(out.columns)


def test_example_web_dedup(spark, tmp_path):
    rows = []
    for i in range(20):
        url = f"http://w.com/item/{i}"
        canon = f"http://w.com/item/{i - i % 2}"
        html = (
            f'<html><link rel="canonical" href="{canon}"/></html>'
            if i % 2
            else "<html></html>"
        ).encode()
        rows.append((url, html))
    spark.createDataFrame(rows, "url string, html binary").write.parquet(
        str(tmp_path / "pages_pq")
    )
    from amanogawa_spark.plans.config import run_config

    run_config(_stage(tmp_path, "web_dedup.toml"), spark)
    out = spark.read.csv(str(tmp_path / "out_templates"), header=True)
    got = {(r["host"], r["template"]): int(r["n_urls"]) for r in out.collect()}
    assert got == {("w.com", "/item/*"): 10}


def test_example_recrawl_cdc(spark, tmp_path):
    shared = (
        "a long syndicated article body that recurs across many mirror "
        "pages of the same publisher network with minor local variations "
        "and keeps recurring paragraph after paragraph in every regional "
        "edition that republishes the wire feed verbatim each morning"
    )
    rows = [(0, shared), (1, shared + " local tail"), (2, "an original piece of writing")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "docs_pq")
    )
    from amanogawa_spark.plans.config import run_config

    run_config(_stage(tmp_path, "recrawl_cdc.toml"), spark)
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out_kept")).collect()}
    assert 2 in kept and kept != {0, 1, 2}


def test_example_clustered_archive(spark, tmp_path):
    rows = []
    for i in range(90):
        h = i % 3
        body = " ".join(f"h{h}w{(j * 37 + h * 101) % 997}" for j in range(40))
        rows.append((i, f"site{h}.example", body + f" payload {i}"))
    spark.createDataFrame(rows, "doc_id long, host string, text string").write.parquet(
        str(tmp_path / "docs_pq")
    )
    from amanogawa_spark.plans.config import run_config

    run_config(_stage(tmp_path, "clustered_archive.toml"), spark)
    out = spark.read.parquet(str(tmp_path / "out_archive"))
    assert out.count() > 0  # keep-filter retains the non-pathological docs

    def _sorted_within(it):
        prev = None
        for row in it:
            k = (row["host"], row["doc_id"])
            assert prev is None or k >= prev, (prev, k)
            prev = k
            yield row

    assert out.rdd.mapPartitions(_sorted_within).count() == out.count()


def test_example_boilerplate_line_dedup(spark, tmp_path):
    footer = "cookie consent banner text"
    rows = [
        (0, f"real article zero\n{footer}"),
        (1, f"real article one\n{footer}"),
        (2, footer),          # only boilerplate -> becomes empty
        (3, footer),          # after line removal 2 and 3 are exact dups
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "docs_pq")
    )
    from amanogawa_spark.plans.config import run_config

    run_config(_stage(tmp_path, "boilerplate_line_dedup.toml"), spark)
    out = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out_clean")).collect()
    }
    # doc 0 keeps the first footer occurrence; doc 1 loses it; docs 2/3
    # collapse to one empty survivor via the chained exact dedup
    assert out[0] == f"real article zero\n{footer}"
    assert out[1] == "real article one"
    assert 2 in out and out[2] == "" and 3 not in out
