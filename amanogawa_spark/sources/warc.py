"""Common-Crawl-style WARC ingestion (stdlib-only, Arrow-batched).

The north rule's input is "Common-Crawl-style web pages" — on real
Common Crawl those arrive as WARC files, not parquet. This module closes
the ingestion gap: ``read_warc`` parses WARC 1.0/1.1 files (plain or
gzip, including the per-record-gzip-member layout Common Crawl uses)
into a DataFrame, and ``warc_pages`` shapes ``response`` records into
the engine's canonical pages table ``(url, warc_ts, html, text, lang)``
per ``BASELINE.json.input_hint``.

Reference anchor: the reference's source/format split
(``plugin/source/file/file.cpp:20-33`` dispatching to a format plugin's
parser) — WARC is a new ``format.type`` the reference never had, wired
through the same TOML config dispatch (``plans/config.py``).

Scale design (100 TB of WARCs):

- ``spark.read.format("binaryFile")`` lists files cheaply and hands each
  file's bytes to ONE task; parsing happens inside ``mapInPandas``
  (Arrow-batched, no per-row Python serde, zero shuffles — a pure map
  over the scan, exactly like the HTML-extraction stage it feeds).
- Parallelism is per-file. Common Crawl ships ~1 GB WARCs in ~64k-file
  segments, so a 100 TB crawl is ~100k independent tasks — far more
  than any executor count; no repartition needed before the next stage.
- Memory is bounded by one decompressed file per task (CC WARCs are
  ~1 GB gz / ~4-5 GB raw). ``max_record_bytes`` truncates pathological
  single records; executors need headroom for one file, which is the
  standard sizing for CC processing (same bound as any WARC toolkit).
  Records stream out of the parser one at a time — the parser never
  builds a second whole-file copy.
- Everything is a pure function of the file bytes: byte-stable across
  partitionings and executors (north-rule determinism requirement).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("record_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _maybe_decompress(data: bytes) -> bytes:
    """Transparently handle gzip'd WARCs.

    ``gzip.decompress`` consumes ALL members of a multi-member stream,
    which is exactly Common Crawl's layout (one gzip member per record,
    members concatenated).
    """
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def _split_http_payload(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response bytes → (status, content_type, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block[:5] in (b"HTTP/",):
        return None, None, block
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(b"\r\n")
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = _parse_headers(b"\r\n".join(lines[1:])).get("content-type")
    return status, ctype, body


def _iso_ts(val: str | None) -> datetime | None:
    if not val:
        return None
    try:
        return datetime.strptime(val, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def parse_warc_members(data: bytes, max_record_bytes: int = 1 << 26) -> Iterator[dict]:
    """Yield one dict per WARC record from raw (already-decompressed) bytes.

    WARC record grammar: ``WARC/1.x\\r\\n`` header lines, blank line,
    ``Content-Length`` bytes of block, then ``\\r\\n\\r\\n``. Streaming
    cursor — no per-record copies of the remainder.
    """
    buf = io.BytesIO(data)
    while True:
        line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # skip inter-record padding
        header_lines = []
        while True:
            h = buf.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            header_lines.append(h)
        headers = _parse_headers(b"".join(header_lines))
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        block = buf.read(min(length, max_record_bytes))
        if length > max_record_bytes:
            buf.seek(length - max_record_bytes, io.SEEK_CUR)
        rtype = headers.get("warc-type", "")
        status, ctype, body = (None, headers.get("content-type"), block)
        if rtype == "response":
            status, http_ctype, body = _split_http_payload(block)
            ctype = http_ctype or ctype
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": _iso_ts(headers.get("warc-date")),
            "record_type": rtype,
            "http_status": status,
            "content_type": ctype,
            "payload": body,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    max_record_bytes: int = 1 << 26,
) -> DataFrame:
    """WARC file(s)/glob → DataFrame(url, warc_ts, record_type,
    http_status, content_type, payload).

    One task per file (binaryFile source); the parse is a zero-shuffle
    Arrow-batched map. ``record_types=None`` keeps every record
    (request/metadata/warcinfo included).
    """
    raw = spark.read.format("binaryFile").load(path).select("content")
    want = set(record_types) if record_types else None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                for rec in parse_warc_members(
                    _maybe_decompress(bytes(data)), max_record_bytes
                ):
                    if want is None or rec["record_type"] in want:
                        rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC → the engine's canonical pages table per input_hint:
    ``(url string, warc_ts timestamp, html binary, text string,
    lang string)``. text/lang come from the same deterministic
    extraction stages the parquet path uses, so a WARC-fed pipeline is
    byte-identical to a parquet-fed one on the same pages.
    """
    from amanogawa_spark.functions.html import extract_text
    from amanogawa_spark.operators.text import detect_language

    recs = read_warc(spark, path, record_types=("response",))
    pages = recs.filter(
        F.col("http_status").isNull() | (F.col("http_status") == 200)
    ).select(
        "url", "warc_ts", F.col("payload").alias("html")
    ).withColumn("text", extract_text(F.col("html")))
    return detect_language(pages, "text").withColumnRenamed("lang_pred", "lang")


# ---------------------------------------------------------------- fixtures
def build_warc_bytes(
    records: list[dict], gzip_per_record: bool = False
) -> bytes:
    """Serialize records into valid WARC bytes — the test-fixture writer.

    Each record dict: ``{url, warc_ts (datetime), html (bytes),
    record_type?, http_status?}``. ``gzip_per_record=True`` reproduces
    Common Crawl's one-gzip-member-per-record layout.
    """
    out = []
    for rec in records:
        rtype = rec.get("record_type", "response")
        body = rec.get("html", b"")
        if rtype == "response":
            status = rec.get("http_status", 200)
            block = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        else:
            block = body
        ts = rec["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        member = head + block + b"\r\n\r\n"
        out.append(gzip.compress(member, mtime=0) if gzip_per_record else member)
    return b"".join(out)
