"""Boilerplate chunk removal — per-host duplicated-fragment filtering.

Web pages from one host share navigation, footers, cookie banners; a
training corpus keeps one copy of the CONTENT and none of the chrome.
The CCNet recipe (Wenzek et al., "CCNet: Extracting high quality
monolingual datasets from web crawl data", 2020) deduplicates at the
sub-document level: split every document into small fragments, count in
how many of the host's documents each fragment occurs, and delete
fragments whose document-frequency ratio crosses a threshold.

Fragments here are non-overlapping ``chunk_size``-token windows of the
whitespace-normalized text (real HTML pipelines split on newlines; the
token-window form is layout-independent and matches the reference's
normalized-text convention).  Identity is the md5 of the fragment
string — one 128-bit key per fragment shuffles instead of the text
itself, and md5 exists verbatim in the SQL oracle engine so the
flagging is value-checked end-to-end.

Scale shape: chunking is pure Catalyst (split/sequence/slice/explode —
map-side, no Python); the doc-frequency count is ONE shuffle keyed on
(group, chunk_hash) with map-side partial distinct; per-group doc
totals are a tiny aggregate broadcast back.  Removal is an anti-join of
the chunk table against the flagged set (both sides already hashed) +
one per-doc regroup.  Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def chunk_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    chunk_size: int = 2,
) -> DataFrame:
    """(doc_id, group, chunk_idx, chunk_text, chunk_hash) — non-overlapping
    ``chunk_size``-token fragments, final partial fragment included."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    toks = F.split(_norm(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_size)).cast("int")
    frag = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(
                F.slice(toks, i * chunk_size + 1, chunk_size), " "
            ).alias("chunk_text"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        F.explode(frag).alias("c"),
    ).select(
        "doc_id",
        "group",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.md5(F.col("c.chunk_text")).alias("chunk_hash"),
    )


def boilerplate_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    chunk_size: int = 2,
    min_ratio: float = 0.05,
    min_df: int = 2,
) -> DataFrame:
    """(group, chunk_hash, df, n_docs, df_ratio) — fragments present in
    ≥ ``min_df`` documents AND ≥ ``min_ratio`` of the group's documents."""
    chunks = chunk_table(docs, id_col, text_col, group_col, chunk_size)
    df_tab = chunks.groupBy("group", "chunk_hash").agg(
        F.countDistinct("doc_id").alias("df")
    )
    totals = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    return (
        df_tab.join(F.broadcast(totals), "group")
        .withColumn("df_ratio", F.col("df") / F.col("n_docs"))
        .filter((F.col("df") >= min_df) & (F.col("df_ratio") >= min_ratio))
        .select("group", "chunk_hash", "df", "n_docs", F.round("df_ratio", 8).alias("df_ratio"))
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    chunk_size: int = 2,
    min_ratio: float = 0.05,
    min_df: int = 2,
) -> DataFrame:
    """(doc_id, n_chunks, n_removed, clean_text) — every flagged fragment
    deleted, remaining fragments rejoined in original order."""
    chunks = chunk_table(docs, id_col, text_col, group_col, chunk_size)
    flagged = boilerplate_chunks(
        docs, id_col, text_col, group_col, chunk_size, min_ratio, min_df
    ).select("group", "chunk_hash")
    kept = chunks.join(flagged, ["group", "chunk_hash"], "left_anti")
    totals = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
