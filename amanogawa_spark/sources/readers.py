"""Schema-declared file sources mirroring the reference format plugins.

Reference behaviors re-expressed on ``spark.read``:

- csv (``plugin/format/csv/csv.cpp:41-143``): declared ``columns=[{name,
  type}]`` or header-inferred names with a uniform ``data_type`` fallback
  (default double) and ``skip_columns``; ``num_header_lines`` (we support
  the standard 0/1 header cases); ``delimiter``.
- json (``plugin/format/json/json.cpp:43-180``): JSON array or JSONL
  (``.jsonl`` suffix or ``jsonl=True``), declared schema, and an optional
  pushed-down row filter ``{key, op, cond}`` — in Spark the filter is a
  normal ``.filter`` that Catalyst pushes into the scan.
- xml (``plugin/format/xml/xml.cpp:37-84``): top-level elements → rows,
  child-element text → typed columns. Spark has no built-in XML reader in
  this image, so it's a pandas-UDF parse of ``spark.read.text`` slices —
  kept for parity; not a hot path.

Type names accepted everywhere (reference ``include/util.h:45-48``):
``int/int32``, ``long/int64``, ``double/float64``, ``string/utf8``,
``date/date32/date64``, ``timestamp``.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amanogawa_spark.operators.etl import filter_predicate

_TYPE_MAP = {
    "int": T.IntegerType(),
    "int32": T.IntegerType(),
    "long": T.LongType(),
    "int64": T.LongType(),
    "double": T.DoubleType(),
    "float64": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "utf8": T.StringType(),
    "date": T.DateType(),
    "date32": T.DateType(),
    "date64": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "bool": T.BooleanType(),
}


def normalize_type(name: str) -> T.DataType:
    try:
        return _TYPE_MAP[name.lower()]
    except KeyError:
        pass
    # nested types (array<double>, map<string,long>, …) parse as Spark DDL —
    # an engine extension; the reference's type table is scalar-only
    # (util.h:45-48)
    try:
        return T.DataType.fromDDL(name)
    except Exception:
        raise ValueError(f"unsupported type: {name!r}") from None


def schema_from_columns(columns: list[dict]) -> T.StructType:
    """[{name, type}] → StructType (reference csv.cpp:23-38)."""
    return T.StructType(
        [T.StructField(c["name"], normalize_type(c["type"]), True) for c in columns]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    columns: list[dict] | None = None,
    delimiter: str = ",",
    header: bool = True,
    data_type: str = "double",
    skip_columns: list[str] | None = None,
    num_header_lines: int | None = None,
) -> DataFrame:
    """``num_header_lines`` >= 2 (reference csv.cpp:52-86): skip that many
    leading lines before parsing. Column names come from the declared
    ``columns`` or, when header-inferred, from the FIRST header line (the
    reference's inferred-schema path concatenates fields across ALL header
    lines — an alpha quirk we deliberately diverge from). Multi-header skip
    reads the file as ordered text lines (zipWithIndex = file order) and
    parses the remainder — fine for config-surface inputs; columnar scale
    data should be parquet anyway."""
    if num_header_lines is not None and num_header_lines >= 2:
        lines = (
            spark.read.text(path)
            .rdd.zipWithIndex()
            .filter(lambda pair: pair[1] >= num_header_lines)
            .map(lambda pair: pair[0].value)
        )
        if columns:
            df = spark.read.csv(lines, schema=schema_from_columns(columns), sep=delimiter)
        else:
            first_header = spark.read.text(path).rdd.zipWithIndex().filter(
                lambda pair: pair[1] == 0
            ).map(lambda pair: pair[0].value).collect()[0]
            names = first_header.split(delimiter)
            df = spark.read.csv(lines, sep=delimiter)
            typ = normalize_type(data_type)
            df = df.select(
                *[F.col(c).cast(typ).alias(n) for c, n in zip(df.columns, names)]
            )
        if skip_columns:
            df = df.drop(*skip_columns)
        return df
    if columns:
        df = spark.read.csv(
            path, schema=schema_from_columns(columns), sep=delimiter, header=header
        )
    else:
        # header-inferred names, uniform data_type (reference csv.cpp:50-80)
        df = spark.read.csv(path, sep=delimiter, header=header)
        typ = normalize_type(data_type)
        df = df.select(*[F.col(c).cast(typ).alias(c) for c in df.columns])
    if skip_columns:
        df = df.drop(*skip_columns)
    return df


def read_json(
    spark: SparkSession,
    path: str,
    columns: list[dict] | None = None,
    jsonl: bool | None = None,
    row_filter: dict | None = None,
) -> DataFrame:
    is_jsonl = jsonl if jsonl is not None else path.endswith(".jsonl")
    schema = schema_from_columns(columns) if columns else None
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    # Spark reads JSONL natively; a whole-file JSON array needs multiLine
    df = reader.option("multiLine", not is_jsonl).json(path)
    if row_filter:
        df = df.filter(
            filter_predicate(row_filter["key"], row_filter["op"], row_filter["cond"])
        )
    return df


def read_xml(
    spark: SparkSession,
    path: str,
    columns: list[dict],
    row_tag: str | None = None,
) -> DataFrame:
    """Parse top-level child elements of the root as rows (xml.cpp:37-84).

    Whole-document parse in a pandas UDF over the (small) file content —
    XML was never the reference's scale path either.
    """
    schema = schema_from_columns(columns)
    raw = spark.read.text(path, wholetext=True)

    col_names = [c["name"] for c in columns]

    def parse(iterator):
        for pdf in iterator:
            rows = []
            for doc in pdf["value"]:
                root = ET.fromstring(doc)
                elems = root.findall(row_tag) if row_tag else list(root)
                for el in elems:
                    rows.append(
                        {n: (el.findtext(n) if el.find(n) is not None else None) for n in col_names}
                    )
            yield pd.DataFrame(rows, columns=col_names)

    str_schema = T.StructType([T.StructField(n, T.StringType(), True) for n in col_names])
    parsed = raw.mapInPandas(parse, schema=str_schema)
    return parsed.select(
        *[F.col(c["name"]).cast(normalize_type(c["type"])).alias(c["name"]) for c in columns]
    )
