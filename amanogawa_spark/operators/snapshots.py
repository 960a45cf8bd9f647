"""Content-level snapshot comparison — what moved between two crawls.

``graph/diff.py`` diffs the LINK structure between snapshots; this
module diffs the CONTENT: keyed by document fingerprint (normalized-
text hash, same normalization as ``operators/text.py``), it classifies
every fingerprint as unchanged (same URL still serves it), moved (the
content survives at a different URL — site migrations, CDN moves,
www/apex flips), added, or removed.  Moved-content pairs feed the
redirect resolver (``graph/redirects.py``) as inferred aliases when no
HTTP redirect was recorded.

Scale shape: fingerprinting is map-side (one hash of the normalized
text); every classification is a fingerprint-keyed join — content
hashes distribute uniformly, no skew.  The moved-pair fan-out is
quadratic per fingerprint (old×new URL sets), so both sides are capped
at ``max_per_fp`` URLs per fingerprint — boilerplate-identical pages
(empty pages, soft-404 templates) would otherwise cross-product; the
cap drops exactly those degenerate fingerprints, which are not
migrations in any useful sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprints(
    df: DataFrame, url_col: str, text_col: str, hash_fn: str
) -> DataFrame:
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    if hash_fn == "md5":
        fp = F.md5(F.encode(norm, "UTF-8"))
    elif hash_fn == "xxhash64":
        fp = F.xxhash64(norm).cast("string")
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    return df.select(fp.alias("fp"), F.col(url_col).alias("url")).distinct()


def content_churn(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """1-row (n_unchanged, n_moved, n_added, n_removed) — fingerprint
    classes between two snapshots.

    unchanged: fingerprint has ≥1 URL serving it in BOTH snapshots at
    the same address; moved: fingerprint present in both but no shared
    URL; added/removed: fingerprint on one side only.
    """
    fo = _fingerprints(old, url_col, text_col, hash_fn)
    fn_ = _fingerprints(new, url_col, text_col, hash_fn)
    o_fps = fo.select("fp").distinct()
    n_fps = fn_.select("fp").distinct()
    same_addr = fo.join(fn_, ["fp", "url"], "left_semi").select("fp").distinct()
    both = o_fps.join(n_fps, "fp", "left_semi")
    unchanged = both.join(same_addr, "fp", "left_semi")
    moved = both.join(same_addr, "fp", "left_anti")
    added = n_fps.join(o_fps, "fp", "left_anti")
    removed = o_fps.join(n_fps, "fp", "left_anti")
    counts = [df.count() for df in (unchanged, moved, added, removed)]
    spark = old.sparkSession
    return spark.createDataFrame(
        [tuple(counts)],
        "n_unchanged long, n_moved long, n_added long, n_removed long",
    )


def moved_content(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    max_per_fp: int = 4,
) -> DataFrame:
    """(fp, old_url, new_url) — inferred content migrations: the old and
    new addresses of every moved fingerprint (no shared URL between
    snapshots), both URL sets capped at ``max_per_fp``."""
    fo = _fingerprints(old, url_col, text_col, hash_fn)
    fn_ = _fingerprints(new, url_col, text_col, hash_fn)
    gone = fo.join(fn_, ["fp", "url"], "left_anti")
    fresh = fn_.join(fo, ["fp", "url"], "left_anti")
    # a fingerprint still served at ANY shared URL is not a move
    same_addr = fo.join(fn_, ["fp", "url"], "left_semi").select("fp").distinct()
    gone = gone.join(same_addr, "fp", "left_anti")
    fresh = fresh.join(same_addr, "fp", "left_anti")

    def _cap(df: DataFrame) -> DataFrame:
        c = df.groupBy("fp").agg(F.count("*").alias("_c"))
        return df.join(
            c.filter(F.col("_c") <= max_per_fp).select("fp"), "fp", "left_semi"
        )

    g, f2 = _cap(gone), _cap(fresh)
    return g.select("fp", F.col("url").alias("old_url")).join(
        f2.select("fp", F.col("url").alias("new_url")), "fp"
    )
