"""File sinks mirroring the reference's ``sink.file`` + format writers.

- csv write (``plugin/format/csv/csv.cpp:145-216``): header on/off
  (``write_header``), declared column subset, custom delimiter.
- json write / xml write are unimplemented throws in the reference
  (``json.cpp:182-187``, ``xml.cpp:86-91``); Spark gives them for free,
  so we implement them anyway.
- parquet is the engine's native interchange + checkpoint format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    columns: list[str] | None = None,
    delimiter: str = ",",
    write_header: bool = True,
    mode: str = "overwrite",
) -> None:
    if columns:
        df = df.select(*columns)
    df.write.mode(mode).option("header", write_header).option("sep", delimiter).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_xml(
    df: DataFrame,
    path: str,
    root_tag: str = "rows",
    row_tag: str = "row",
    mode: str = "overwrite",
) -> None:
    """Element-per-row XML. The reference's xml write is an unimplemented
    throw (``plugin/format/xml/xml.cpp:86-91``); implemented anyway for
    format symmetry (like json write). Each output part file is a complete
    document (own root element) so :func:`~amanogawa_spark.sources.readers.
    read_xml`'s whole-document parse round-trips a directory of parts. XML
    is not a scale path — per-partition Python here is acceptable."""
    from xml.sax.saxutils import escape

    cols = df.columns

    def to_doc(it):
        rows = [f"<{root_tag}>"]
        for r in it:
            cells = "".join(
                f"<{c}>{escape(str(r[c]))}</{c}>" for c in cols if r[c] is not None
            )
            rows.append(f"<{row_tag}>{cells}</{row_tag}>")
        rows.append(f"</{root_tag}>")
        yield "\n".join(rows)

    if mode == "overwrite":
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    df.rdd.mapPartitions(to_doc).saveAsTextFile(path)
