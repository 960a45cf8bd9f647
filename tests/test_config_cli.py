"""TOML job-spec loader + CLI golden tests.

Translations of the reference's README examples (README.md:51-80 task one,
README.md:116-216 task three) and example/simple.toml, asserting the
reference's documented CSV outputs. Spark sinks write part-file
directories and give no row-order guarantee, so outputs compare as row
multisets (the reference's single-threaded writer fixes an order; the
VALUES are the contract)."""

from __future__ import annotations

import os
import textwrap


def _read_rows(spark, path: str, delimiter: str = ","):
    df = spark.read.csv(path, header=True, sep=delimiter)
    return sorted(tuple(r) for r in df.collect())


def test_task_one_json_filter_to_csv(spark, tmp_path):
    """README task one: JSON array -> pushed contains-filter -> tsv."""
    (tmp_path / "sample.json").write_text(
        '[{"id": 1, "name": "Aries"}, {"id": 2, "name": "Taurus"}, '
        '{"id": 3, "name": "Gemini"}]'
    )
    (tmp_path / "job.toml").write_text(
        textwrap.dedent(
            """
            [source.read_sample]
            type = "file"
            path = "sample.json"
            [source.read_sample.format]
            type = "json"
            columns = [
              { name = "id", type = "int" },
              { name = "name", type = "string" },
            ]
            filter = { key = "name", op = "contains", cond = "i" }

            [sink.write_sample]
            type = "file"
            path = "sample_out"
            from = "read_sample"
            [sink.write_sample.format]
            type = "csv"
            delimiter = "\\t"
            """
        )
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    rows = _read_rows(spark, str(tmp_path / "sample_out"), "\t")
    assert rows == [("1", "Aries"), ("3", "Gemini")]


def test_simple_toml_anonymous_linear_wiring(spark, tmp_path):
    """example/simple.toml shape: bare [source]/[sink] tables, no names,
    no 'from' — wired linearly."""
    (tmp_path / "kinmosa.csv").write_text(
        "id,name,blood_id\n0,karen,3\n1,ayaya,0\n2,alice,0\n3,shino,0\n4,yo-ko,2\n"
    )
    (tmp_path / "job.toml").write_text(
        textwrap.dedent(
            """
            [source]
            type = "file"
            path = "kinmosa.csv"
            [source.format]
            type = "csv"
            skip_header = true
            columns = [
              { name = "id", type = "int" },
              { name = "name", type = "string" },
              { name = "blood_type", type = "int" },
            ]

            [sink]
            type = "file"
            path = "kinmosa_out"
            [sink.format]
            type = "csv"
            delimiter = "\\t"
            """
        )
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    rows = _read_rows(spark, str(tmp_path / "kinmosa_out"), "\t")
    assert rows == [
        ("0", "karen", "3"),
        ("1", "ayaya", "0"),
        ("2", "alice", "0"),
        ("3", "shino", "0"),
        ("4", "yo-ko", "2"),
    ]


def _write_task_three(tmp_path) -> str:
    (tmp_path / "kinmosa.csv").write_text(
        "id,name,blood_id\n1,karen,3\n2,ayaya,0\n3,shino,0\n4,yo-ko,2\n5,alice,0\n"
    )
    (tmp_path / "blood.csv").write_text("id,type\n0,A\n1,B\n2,O\n3,AB\n")
    cfg = tmp_path / "config.toml"
    cfg.write_text(
        textwrap.dedent(
            """
            [source.read_awesome_csv]
            type = "file"
            path = "kinmosa.csv"
            [source.read_awesome_csv.format]
            type = "csv"
            skip_header = true
            columns = [
              { name = "id", type = "int" },
              { name = "name", type = "string" },
              { name = "blood_type", type = "int" },
            ]

            [flow.awesome_filter]
            type = "filter"
            from = "read_awesome_csv"

            [branch.id_name_blood]
            type = "column"
            from = "awesome_filter"
            to = [
              { name = "id_name", columns = [ "id", "name" ] },
              { name = "blood", columns = [ "blood_type" ] },
            ]

            [source.about_blood]
            type = "file"
            path = "blood.csv"
            [source.about_blood.format]
            type = "csv"
            skip_header = true
            columns = [
              { name = "id", type = "int" },
              { name = "type_string", type = "string" },
            ]

            [confluence.blood_type]
            type = "key"
            from = [
              { name = "about_blood", key = "id" },
              { name = "blood", key = "blood_type" },
            ]

            [sink.write_id_name_tsv]
            type = "file"
            path = "result_id_name.tsv"
            from = "id_name"
            [sink.write_id_name_tsv.format]
            type = "csv"
            delimiter = "\\t"
            columns = [] # all

            [sink.write_blood_csv]
            type = "file"
            path = "result_blood.csv"
            from = "blood_type"
            [sink.write_blood_csv.format]
            type = "csv"
            columns = [] # all
            """
        )
    )
    return str(cfg)


def test_task_three_branch_confluence_golden(spark, tmp_path):
    """README task three: filter (stub=identity) -> column branch ->
    key confluence -> two sinks; asserts the README's exact output values
    (result_id_name.tsv all five id/name rows; result_blood.csv the joined
    (id, type_string) multiset with A three times)."""
    cfg = _write_task_three(tmp_path)
    from amanogawa_spark.plans.config import run_config

    run_config(cfg, spark)
    id_name = _read_rows(spark, str(tmp_path / "result_id_name.tsv"), "\t")
    assert id_name == [
        ("1", "karen"),
        ("2", "ayaya"),
        ("3", "shino"),
        ("4", "yo-ko"),
        ("5", "alice"),
    ]
    blood = _read_rows(spark, str(tmp_path / "result_blood.csv"))
    assert blood == [("0", "A"), ("0", "A"), ("0", "A"), ("2", "O"), ("3", "AB")]


def test_cli_main_runs_config(spark, tmp_path):
    """python -m amanogawa_spark.cli <config> parity (cli.cpp:5-9)."""
    cfg = _write_task_three(tmp_path)
    from amanogawa_spark.cli import main

    assert main([cfg]) == 0
    assert os.path.isdir(str(tmp_path / "result_blood.csv"))


def test_task_two_to_graph_bow(spark, tmp_path):
    """README task two shape: JSONL -> to_graph (bow, k=2) -> csv edges.
    The reference alpha's demo output is internally inconsistent (its
    nearest-neighbor list excludes the highest-cosine pair), so the golden
    values here are the engine's documented cosine-kNN semantics: posting
    lists only join docs sharing a term, top-2 per node, canonical dedup."""
    (tmp_path / "comments.jsonl").write_text(
        '{"content": "Apple Strawberry Apple", "command": "foo"}\n'
        '{"content": "Apple Strawberry", "command": "foo"}\n'
        '{"content": "Apple Apple", "command": "bar"}\n'
        '{"content": "Banana Banana", "command": "foo bar"}\n'
        '{"content": "Pineapple Banana Banana", "command": "foo"}\n'
    )
    (tmp_path / "job.toml").write_text(
        """
[source]
type = "file"
path = "comments.jsonl"
[source.format]
type = "json"
columns = [ { name = "content", type = "string" } ]

[flow]
type = "to_graph"
mode = "bow"
column = "content"
knn = { k = 2 }

[sink]
type = "file"
path = "graph_out"
[sink.format]
type = "csv"
delimiter = " "
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    rows = _read_rows(spark, str(tmp_path / "graph_out"), " ")
    assert rows == [("0", "1"), ("0", "2"), ("1", "2"), ("3", "4")]


def test_flow_extensions_sample_dedup_tfidf(spark, tmp_path):
    """Engine-extension flow types: curation ops declaratively reachable."""
    docs = "\n".join(
        f'{{"doc_id": {i}, "text": "{"alpha beta" if i % 2 else "gamma delta gamma"}", "grp": "g{i % 2}"}}'
        for i in range(10)
    )
    (tmp_path / "docs.jsonl").write_text(docs + "\n")
    (tmp_path / "job.toml").write_text(
        """
[source]
type = "file"
path = "docs.jsonl"
[source.format]
type = "json"
columns = [
  { name = "doc_id", type = "long" },
  { name = "text", type = "string" },
  { name = "grp", type = "string" },
]

[flow.pick]
type = "sample"
method = "stratified"
group_column = "grp"
n = 2
keys = ["doc_id"]

[flow.uniq]
type = "dedup"
method = "exact"
from = "pick"

[flow.weights]
type = "tfidf"
from = "uniq"

[sink]
type = "file"
path = "weights_out"
from = "weights"
[sink.format]
type = "csv"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    out = spark.read.csv(str(tmp_path / "weights_out"), header=True)
    rows = {(r["id"], r["term"]) for r in out.collect()}
    # stratified pick: 2 per grp (4 docs) -> exact dedup keeps one per
    # distinct text (2 docs) -> tfidf emits one row per (doc, term)
    terms = {t for _, t in rows}
    assert terms <= {"alpha", "beta", "gamma", "delta"}
    ids = {i for i, _ in rows}
    assert len(ids) == 2


def test_flow_extensions_quality_pack(spark, tmp_path):
    """quality (c4) -> pack flow types chain declaratively."""
    docs = "\n".join(
        f'{{"doc_id": {i}, "text": "Keep this sentence number {i}.\\nmenu nav", "n_tokens": {50 + i}}}'
        for i in range(8)
    )
    (tmp_path / "docs.jsonl").write_text(docs + "\n")
    (tmp_path / "job.toml").write_text(
        """
[source]
type = "file"
path = "docs.jsonl"
[source.format]
type = "json"
columns = [
  { name = "doc_id", type = "long" },
  { name = "text", type = "string" },
  { name = "n_tokens", type = "long" },
]

[flow.cleaned]
type = "quality"
method = "c4"

[flow.packed]
type = "pack"
max_tokens = 128
id_column = "doc_id"
tokens_column = "n_tokens"
from = "source"

[sink.clean_out]
type = "file"
path = "clean_out"
from = "cleaned"
[sink.clean_out.format]
type = "parquet"

[sink.pack_out]
type = "file"
path = "pack_out"
from = "packed"
[sink.pack_out.format]
type = "parquet"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    clean = spark.read.parquet(str(tmp_path / "clean_out"))
    assert clean.count() == 8
    assert all("menu nav" not in r.clean_text for r in clean.collect())
    packed = spark.read.parquet(str(tmp_path / "pack_out"))
    rows = packed.collect()
    assert len(rows) == 8
    assert {r.seq_id for r in rows}  # bin ids assigned
    assert all(0 <= r.seq_offset < 128 for r in rows)


def test_orc_source_sink_roundtrip(spark, tmp_path):
    """ORC as a declared format on both ends (Spark-native columnar path,
    same dispatch as parquet)."""
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    src.write.orc(str(tmp_path / "in.orc"))
    (tmp_path / "job.toml").write_text(
        f"""
[source]
type = "file"
path = "in.orc"
[source.format]
type = "orc"

[flow]
type = "filter"
column = "v"
op = ">"
cond = 2.0

[sink]
type = "file"
path = "out.orc"
[sink.format]
type = "orc"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    out = spark.read.orc(str(tmp_path / "out.orc")).collect()
    assert [(r.id, r.name, r.v) for r in out] == [(2, "b", 2.5)]


def test_flow_extensions_bpe_semdedup(spark, tmp_path):
    """bpe_encode (fixed merge list) and semdedup flow types run from TOML."""
    docs = "\n".join(
        f'{{"doc_id": {i}, "text": "spark sparse spat"}}' for i in range(4)
    )
    (tmp_path / "docs.jsonl").write_text(docs + "\n")
    vecs = "\n".join(
        f'{{"vec_id": {i}, "embedding": [1.0, {float(i % 2)}]}}' for i in range(6)
    )
    (tmp_path / "vecs.jsonl").write_text(vecs + "\n")
    (tmp_path / "job.toml").write_text(
        """
[source.docs]
type = "file"
path = "docs.jsonl"
[source.docs.format]
type = "json"
columns = [
  { name = "doc_id", type = "long" },
  { name = "text", type = "string" },
]

[source.vecs]
type = "file"
path = "vecs.jsonl"
[source.vecs.format]
type = "json"
columns = [
  { name = "vec_id", type = "long" },
  { name = "embedding", type = "array<double>" },
]

[flow.encoded]
type = "bpe_encode"
merges = [["s", "p"], ["sp", "a"]]
from = "docs"

[flow.deduped]
type = "semdedup"
threshold = 0.999
stride = 3
from = "vecs"

[sink.enc_out]
type = "file"
path = "enc_out"
from = "encoded"
[sink.enc_out.format]
type = "parquet"

[sink.dedup_out]
type = "file"
path = "dedup_out"
from = "deduped"
[sink.dedup_out.format]
type = "parquet"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    enc = spark.read.parquet(str(tmp_path / "enc_out"))
    rows = {r["id"]: list(r["tokens"]) for r in enc.collect()}
    assert rows[0] == ["spa", "r", "k", "spa", "r", "s", "e", "spa", "t"]
    dd = spark.read.parquet(str(tmp_path / "dedup_out"))
    got = {r["id"]: r["keep"] for r in dd.collect()}
    # ids 0/2/4 share [1,0], ids 1/3/5 share [1,1]: keep the smallest of each
    assert got == {0: True, 2: False, 4: False, 1: True, 3: False, 5: False}


def test_flow_extensions_canonical_templates(spark, tmp_path):
    """canonical_dedup (keep_only) -> url_templates chain declaratively
    over a parquet pages source with binary html."""
    rows = []
    for i in range(12):
        url = f"http://a.com/item/{i}"
        canon = f"http://a.com/item/{i - i % 2}"  # odd pages point at even
        html = (
            f'<html><link rel="canonical" href="{canon}"/><p>b</p></html>'
            if i % 2
            else "<html><p>b</p></html>"
        ).encode()
        rows.append((url, html))
    spark.createDataFrame(rows, "url string, html binary").write.parquet(
        str(tmp_path / "pages_pq")
    )
    (tmp_path / "job.toml").write_text(
        """
[source]
type = "file"
path = "pages_pq"
[source.format]
type = "parquet"

[flow.canon]
type = "canonical_dedup"
keep_only = true

[flow.shapes]
type = "url_templates"
wildcard_min_distinct = 4
from = "canon"

[sink]
type = "file"
path = "tpl_out"
from = "shapes"
[sink.format]
type = "csv"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    out = spark.read.csv(str(tmp_path / "tpl_out"), header=True)
    got = {(r["host"], r["template"]): int(r["n_urls"]) for r in out.collect()}
    # 12 pages -> 6 canonical survivors (the even pages), one template
    assert got == {("a.com", "/item/*"): 6}


def test_cdc_dedup_flow_type(spark, tmp_path):
    """cdc_dedup as a declarative curation flow: profile mode emits the
    per-doc dup table; max_dup_frac mode keep-filters the corpus."""
    shared = (
        "this long shared passage of web text appears in several documents "
        "and makes their chunk fingerprints collide across the corpus"
    )
    rows = [(0, shared), (1, shared + " with a small tail"), (2, "totally distinct words")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "docs_pq")
    )
    (tmp_path / "cdc.toml").write_text(
        """
[source]
type = "file"
path = "docs_pq"
[source.format]
type = "parquet"

[flow.dedup]
type = "cdc_dedup"
modulus = 16
max_dup_frac = 0.5

[sink]
type = "file"
path = "kept_out"
from = "dedup"
[sink.format]
type = "parquet"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "cdc.toml"), spark)
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "kept_out")).collect()}
    assert 2 in kept  # unique doc always survives
    assert kept != {0, 1, 2}  # at least one heavy-dup doc filtered


def test_sink_cluster_by_layout(spark, tmp_path):
    """[sink.format] cluster_by: rows range-sorted across output files so
    near-duplicates share row groups; content identical either way."""
    import csv as _csv

    with open(tmp_path / "docs.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["doc_id", "host", "text"])
        for i in range(120):
            w.writerow([i, f"h{i % 5}", f"tpl{i % 5} body payload {i}"])
    (tmp_path / "job.toml").write_text(
        textwrap.dedent(
            """
            [source]
            type = "file"
            path = "docs.csv"
            [source.format]
            type = "csv"
            skip_header = true
            columns = [
              { name = "doc_id", type = "int" },
              { name = "host", type = "string" },
              { name = "text", type = "string" },
            ]

            [sink]
            type = "file"
            path = "docs_out"
            [sink.format]
            type = "parquet"
            coalesce = 3
            cluster_by = ["host", "doc_id"]
            """
        )
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    out = spark.read.parquet(str(tmp_path / "docs_out"))
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(120))

    def _sorted_within(it):
        prev = None
        for row in it:
            k = (row["host"], row["doc_id"])
            assert prev is None or k >= prev, (prev, k)
            prev = k
            yield row

    assert out.rdd.mapPartitions(_sorted_within).count() == 120


def test_flow_extensions_topics_unigram(spark, tmp_path):
    """topics (PLSA dominant label) and unigram_encode flow types run
    from TOML; planted two-vocabulary docs split cleanly by topic and
    every encoded doc accounts for all of its words."""
    lines = []
    for i in range(8):
        words = " ".join(
            (f"alpha{j} beta{j}" if i < 4 else f"gamma{j} delta{j}")
            for j in range(4)
        )
        lines.append(f'{{"doc_id": {i}, "text": "{words}"}}')
    (tmp_path / "docs.jsonl").write_text("\n".join(lines) + "\n")
    (tmp_path / "job.toml").write_text(
        """
[source.docs]
type = "file"
path = "docs.jsonl"
[source.docs.format]
type = "json"
columns = [
  { name = "doc_id", type = "long" },
  { name = "text", type = "string" },
]

[flow.topiced]
type = "topics"
k = 2
iterations = 15
dominant = true
from = "docs"

[flow.encoded]
type = "unigram_encode"
rounds = 2
vocab_size = 40
max_piece_len = 4
min_count = 2
from = "docs"

[sink.topic_out]
type = "file"
path = "topic_out"
from = "topiced"
[sink.topic_out.format]
type = "parquet"

[sink.enc_out]
type = "file"
path = "enc_out"
from = "encoded"
[sink.enc_out.format]
type = "parquet"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "job.toml"), spark)
    topics = {
        r["doc_id"]: r["topic"]
        for r in spark.read.parquet(str(tmp_path / "topic_out")).collect()
    }
    assert set(topics) == set(range(8))
    g0 = {topics[d] for d in range(4)}
    g1 = {topics[d] for d in range(4, 8)}
    assert len(g0) == 1 and len(g1) == 1 and g0 != g1
    enc = {
        r["id"]: (r["n_words"], r["n_pieces"])
        for r in spark.read.parquet(str(tmp_path / "enc_out")).collect()
    }
    assert set(enc) == set(range(8))
    for n_words, n_pieces in enc.values():
        assert n_words == 8 and n_pieces >= n_words


def test_line_dedup_flow_type(spark, tmp_path):
    """line_dedup as a declarative curation flow: repeated lines vanish
    corpus-wide except their first occurrence; text column is replaced,
    other columns ride through."""
    rows = [
        (0, "en", "keep me\nboilerplate footer"),
        (1, "en", "boilerplate footer\nunique middle\nboilerplate footer"),
        (2, "ja", "boilerplate footer"),
    ]
    spark.createDataFrame(rows, "doc_id long, lang string, text string").write.parquet(
        str(tmp_path / "ld_pq")
    )
    (tmp_path / "ld.toml").write_text(
        """
[source]
type = "file"
path = "ld_pq"
[source.format]
type = "parquet"

[flow.clean]
type = "line_dedup"

[sink]
type = "file"
path = "ld_out"
from = "clean"
[sink.format]
type = "parquet"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "ld.toml"), spark)
    got = {
        r["doc_id"]: (r["lang"], r["text"])
        for r in spark.read.parquet(str(tmp_path / "ld_out")).collect()
    }
    assert got[0] == ("en", "keep me\nboilerplate footer")
    assert got[1] == ("en", "unique middle")
    assert got[2] == ("ja", "")


def test_rmat_source_type(spark, tmp_path):
    """[source] type='rmat': the zero-input synthetic edge source feeds an
    ordinary flow/sink pipeline — scale rehearsals without staged data."""
    (tmp_path / "rmat.toml").write_text(
        """
[source]
type = "rmat"
scale = 5
edge_factor = 2
seed = 9

[flow.keep]
type = "filter"
column = "src_id"
op = "!="
cond = 0

[sink]
type = "file"
path = "rmat_out"
from = "keep"
[sink.format]
type = "parquet"
"""
    )
    from amanogawa_spark.plans.config import run_config

    run_config(str(tmp_path / "rmat.toml"), spark)
    out = spark.read.parquet(str(tmp_path / "rmat_out"))
    rows = out.collect()
    assert 0 < len(rows) <= 64  # 2<<5 edges minus the filtered src 0
    assert all(0 < r["src_id"] < 32 and 0 <= r["dst_id"] < 32 for r in rows)
    # deterministic: a direct call produces the identical edge multiset
    from amanogawa_spark.graph.generate import rmat_edges

    again = rmat_edges(spark, 5, 2, seed=9).filter("src_id != 0").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
