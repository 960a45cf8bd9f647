"""ETL parity: filter ops, branch, key-join semantics, readers/writers.

Mirrors the reference's README worked examples (SURVEY.md §5): the
kinmosa/blood join with duplicate-key fan-out, filter + branch + two
sinks, and schema-declared csv/json/jsonl/xml reads.
"""

from __future__ import annotations

import json
import os

import pytest

from amanogawa_spark.operators.etl import branch_columns, key_join, row_filter
from amanogawa_spark.sources.readers import read_csv, read_json, read_xml
from amanogawa_spark.sources.writers import write_csv


@pytest.fixture(scope="module")
def kinmosa(spark):
    # cf. /root/reference/example/kinmosa.csv + README.md:116-216 semantics
    rows = [
        (1, "youko", 1),
        (2, "aya", 2),
        (3, "shino", 3),
        (4, "alice", 3),
        (5, "karen", 2),
    ]
    return spark.createDataFrame(rows, "id int, name string, blood_type int")


@pytest.fixture(scope="module")
def blood(spark):
    rows = [(1, "A"), (2, "B"), (3, "O"), (4, "AB")]
    return spark.createDataFrame(rows, "id int, type_string string")


def test_filter_ops_numeric(spark, kinmosa):
    assert row_filter(kinmosa, "id", ">", 3).count() == 2
    assert row_filter(kinmosa, "id", "<=", 2).count() == 2
    assert row_filter(kinmosa, "blood_type", "==", 3).count() == 2
    assert row_filter(kinmosa, "blood_type", "!=", 3).count() == 3


def test_filter_ops_string(spark, kinmosa):
    assert row_filter(kinmosa, "name", "contains", "a").count() == 3
    assert row_filter(kinmosa, "name", "!contains", "a").count() == 2
    assert row_filter(kinmosa, "name", "==", "shino").count() == 1


def test_filter_unsupported_op(spark, kinmosa):
    with pytest.raises(ValueError):
        row_filter(kinmosa, "id", "~~", 1)


def test_branch_columns(spark, kinmosa):
    outs = branch_columns(kinmosa, {"id_name": ["id", "name"], "blood": ["blood_type"]})
    assert outs["id_name"].columns == ["id", "name"]
    assert outs["blood"].columns == ["blood_type"]
    assert outs["id_name"].count() == 5


def test_key_join_reference_semantics(spark, kinmosa, blood):
    """Inner join, right key dropped, left key name kept, dup fan-out."""
    j = key_join(kinmosa, blood, "blood_type", "id")
    assert j.columns == ["id", "name", "blood_type", "type_string"]
    rows = {(r.id, r.name, r.blood_type, r.type_string) for r in j.collect()}
    assert rows == {
        (1, "youko", 1, "A"),
        (2, "aya", 2, "B"),
        (3, "shino", 3, "O"),
        (4, "alice", 3, "O"),
        (5, "karen", 2, "B"),
    }


def test_key_join_dup_fanout(spark):
    l = spark.createDataFrame([(1, "a"), (1, "b")], "k int, lv string")
    r = spark.createDataFrame([(1, "x"), (1, "y")], "k int, rv string")
    j = key_join(l, r, "k", "k")
    assert j.count() == 4  # full cross of matches (README.md:209-216)


def test_csv_roundtrip(spark, tmp_path, kinmosa):
    out = str(tmp_path / "kin_csv")
    write_csv(kinmosa, out, columns=["id", "name"], delimiter="\t")
    back = read_csv(
        spark,
        out,
        columns=[{"name": "id", "type": "int"}, {"name": "name", "type": "string"}],
        delimiter="\t",
    )
    assert {(r.id, r.name) for r in back.collect()} == {
        (1, "youko"), (2, "aya"), (3, "shino"), (4, "alice"), (5, "karen")
    }


def test_csv_header_inferred_uniform_type(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("a,b,c\n1,2,3\n4,5,6\n")
    df = read_csv(spark, str(p), data_type="double", skip_columns=["c"])
    assert df.columns == ["a", "b"]
    assert df.schema["a"].dataType.typeName() == "double"
    assert df.count() == 2


def test_jsonl_with_pushed_filter(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    recs = [{"content": f"doc {i}", "command": "keep" if i % 2 else "drop"} for i in range(10)]
    p.write_text("\n".join(json.dumps(r) for r in recs))
    df = read_json(
        spark,
        str(p),
        columns=[{"name": "content", "type": "string"}, {"name": "command", "type": "string"}],
        row_filter={"key": "command", "op": "==", "cond": "keep"},
    )
    assert df.count() == 5


def test_json_array_multiline(spark, tmp_path):
    p = tmp_path / "arr.json"
    p.write_text(json.dumps([{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]))
    df = read_json(
        spark, str(p), columns=[{"name": "x", "type": "long"}, {"name": "y", "type": "string"}],
        jsonl=False,
    )
    assert {(r.x, r.y) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_xml_read(spark, tmp_path):
    p = tmp_path / "d.xml"
    p.write_text(
        "<root><row><id>1</id><name>youko</name></row>"
        "<row><id>2</id><name>aya</name></row></root>"
    )
    df = read_xml(
        spark, str(p),
        columns=[{"name": "id", "type": "int"}, {"name": "name", "type": "string"}],
    )
    assert {(r.id, r.name) for r in df.collect()} == {(1, "youko"), (2, "aya")}


def test_csv_multi_header_lines(spark, tmp_path):
    """num_header_lines >= 2 (csv.cpp:52-86): skip N leading lines; names
    from declared columns, or from the FIRST header line when inferred."""
    p = tmp_path / "two_header.csv"
    p.write_text(
        "id,name,score\n#units: none,text,points\n1,ayaya,3.5\n2,karen,4.0\n"
    )
    declared = read_csv(
        spark,
        str(p),
        columns=[
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
        ],
        num_header_lines=2,
    )
    rows = sorted(tuple(r) for r in declared.collect())
    assert rows == [(1, "ayaya", 3.5), (2, "karen", 4.0)]
    inferred = read_csv(spark, str(p), num_header_lines=2, data_type="string")
    assert inferred.columns == ["id", "name", "score"]
    got = sorted(tuple(r) for r in inferred.collect())
    assert got == [("1", "ayaya", "3.5"), ("2", "karen", "4.0")]


def test_xml_write_read_roundtrip(spark, tmp_path):
    """write_xml (reference throws; implemented for symmetry) round-trips
    through read_xml's whole-document parse — per part file, each a
    complete document with its own root."""
    from amanogawa_spark.sources.writers import write_xml

    df = spark.createDataFrame(
        [(1, "Aries", 3.5), (2, "Tau<rus>", None), (3, "Gem&ini", 1.25)],
        "id int, name string, score double",
    ).coalesce(2)
    out = str(tmp_path / "xml_out")
    write_xml(df, out)
    back = read_xml(
        spark,
        out + "/part-*",
        columns=[
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
        ],
    )
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == [(1, "Aries", 3.5), (2, "Tau<rus>", None), (3, "Gem&ini", 1.25)]


def test_latest_by_key_recrawl_dedup(spark):
    """Newest version per url wins; ties break deterministically."""
    from datetime import datetime

    from amanogawa_spark.operators.etl import latest_by_key

    rows = [
        ("a.com", datetime(2026, 1, 1), 1, b"old"),
        ("a.com", datetime(2026, 1, 3), 2, b"new"),
        ("a.com", datetime(2026, 1, 3), 3, b"same-ts"),
        ("b.com", datetime(2026, 1, 2), 4, b"only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, crawl long, html binary")
    got = {
        r.url: (r.crawl, bytes(r.html))
        for r in latest_by_key(df, ["url"], "warc_ts", ["crawl"]).collect()
    }
    assert got == {"a.com": (2, b"new"), "b.com": (4, b"only")}
