"""Distributed deterministic pages corpus — the at-scale bench fixture.

``generate_pages`` (fixtures/pages.py) threads one sequential RNG through
the corpus, so it can only run on the driver. This generator is a **pure
function of the row index** (seeded per-row hashes), so it runs as an
Arrow-batched map over ``spark.range(n)`` — embarrassingly parallel, no
driver materialization, any corpus size. Same statistical shape: Zipf hub
domains, preferential-attachment-ish out-links, dangling pages, a second
disconnected component, self/duplicate links planted.

Used by bench.py for the scaling runs (millions of pages); unit tests
keep the sequential fixture because it carries an exact expected edge set.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_LANGS = ["en", "ja", "de", "fr", "es"]
_WORDS = (
    "river galaxy silver node spark graph crawl page link rank star cluster "
    "vector stream shard anchor index query table column merge join scan"
).split()


def _h(seed: int, i: int, tag: int) -> int:
    """Stable 64-bit hash of (seed, row, tag) — the per-row RNG."""
    b = hashlib.blake2b(
        i.to_bytes(8, "little") + tag.to_bytes(4, "little"),
        key=seed.to_bytes(8, "little"),
        digest_size=8,
    ).digest()
    return int.from_bytes(b, "little")


_CDF_CACHE: dict[int, np.ndarray] = {}


def _zipf_cdf(n_domains: int) -> np.ndarray:
    cdf = _CDF_CACHE.get(n_domains)
    if cdf is None:
        weights = 1.0 / (np.arange(1, n_domains + 1) ** 1.2)
        cdf = np.cumsum(weights / weights.sum())
        _CDF_CACHE[n_domains] = cdf
    return cdf


def _domain_index(h: int, n_domains: int) -> int:
    """Zipf(s~1.2)-ish via inverse CDF over 1/k^1.2 weights."""
    r = (h % (1 << 53)) / float(1 << 53)
    return int(np.searchsorted(_zipf_cdf(n_domains), r)) + 1


def _row(
    i: int,
    n: int,
    seed: int,
    n_domains: int,
    n_b: int,
    out_links=(1, 6),
    block_local_frac: float = 0.0,
    block_size: int = 0,
):
    dom = _domain_index(_h(seed, i, 0), n_domains)
    url = f"https://d{dom}.example.org/p{i}"
    h1 = _h(seed, i, 1)
    n_words = 20 + h1 % 60
    words = [_WORDS[_h(seed, i, 100 + w) % len(_WORDS)] for w in range(n_words)]
    text = f"page {i} :: " + " ".join(words)
    lang = _LANGS[_h(seed, i, 2) % len(_LANGS)]
    # link structure: last n_b pages form an isolated component
    n_a = n - n_b
    lo, hi = (0, n_a) if i < n_a else (n_a, n)
    links: list[int] = []
    if _h(seed, i, 3) % 100 >= 8:  # 8% dangling
        lo_d, hi_d = out_links
        out_deg = lo_d + _h(seed, i, 4) % max(1, hi_d - lo_d + 1)
        for t in range(out_deg):
            ht = _h(seed, i, 200 + t)
            # block-local links model host-level locality (real web graphs
            # keep ~3/4 of links on-host) — pages in the same contiguous
            # index block link to each other; the rest follow the global
            # preferential/uniform mix. This is what gives a partition map
            # something to FIND: a locality-free random graph has no good
            # k-way cut for any partitioner.
            if block_local_frac > 0.0 and block_size > 1 and (
                (ht >> 32) % (1 << 20)
            ) < int(block_local_frac * (1 << 20)):
                b_lo = lo + ((i - lo) // block_size) * block_size
                b_hi = min(hi, b_lo + block_size)
                j = b_lo + ht % (b_hi - b_lo)
            elif ht % 10 < 6 and i > lo + 1:
                frac = ((ht >> 8) % (1 << 26)) / float(1 << 26)
                j = lo + int(frac * frac * (min(i, hi - 1) - lo))
            else:
                j = lo + ht % (hi - lo)
            links.append(j)
        if _h(seed, i, 5) % 100 < 15:
            links.append(i)  # self link (dropped downstream)
        if links and _h(seed, i, 6) % 100 < 30:
            links.append(links[0])  # duplicate link (deduped downstream)
    anchor_urls = [
        f"https://d{_domain_index(_h(seed, j, 0), n_domains)}.example.org/p{j}"
        for j in links
    ]
    anchors = "".join(f'<a href="{u}">link</a>\n' for u in anchor_urls)
    html = (
        f"<!DOCTYPE html><html><head><title>page {i}</title></head><body>\n"
        f'<p id="body">{text}</p>\n{anchors}</body></html>'
    ).encode("utf-8")
    ts = pd.Timestamp("2025-01-01", tz="UTC") + pd.Timedelta(seconds=(i % 10_000_000) * 17)
    return url, ts, html, text, lang


def distributed_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 7,
    n_domains: int = 1000,
    second_component_frac: float = 0.1,
    num_partitions: int | None = None,
    out_links: tuple[int, int] = (1, 6),
    block_local_frac: float = 0.0,
    block_size: int = 0,
) -> DataFrame:
    """``out_links=(lo, hi)`` bounds per-page out-degree — (1, 6) keeps the
    sparse unit-test shape; scaling benches use ~(30, 80) to match real web
    pages (Common Crawl averages ~50-100 hyperlinks per page).

    ``block_local_frac``/``block_size``: fraction of links kept inside the
    page's contiguous ``block_size``-page index block — host-level link
    locality (real web graphs keep most links on-host), which is what
    partition-map quality probes need a corpus to actually contain."""
    n_b = max(3, int(n_pages * second_component_frac))
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n_pages, 1, n_part)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _row(
                    int(i), n_pages, seed, n_domains, n_b, out_links,
                    block_local_frac, block_size,
                )
                for i in pdf["id"]
            ]
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
            yield out

    return base.mapInPandas(gen, PAGES_SCHEMA)


def distributed_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_clusters: int = 1000,
    jitter: float = 0.15,
    seed: int = 5,
) -> DataFrame:
    """(vec_id long, embedding array<double>) — clustered deterministic
    corpus, pure Catalyst (seeded xxhash64 per component, no driver RNG, no
    Python): vec i belongs to cluster xxhash(i) % n_clusters; each
    component = cluster center + jitter. Cluster structure gives LSH/IVF
    buckets realistic density so scale benches exercise the candidate
    joins, not just hashing throughput."""
    from pyspark.sql import functions as F

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n, 1, n_part).select(F.col("id").alias("vec_id"))
    withc = base.withColumn(
        "_c", F.pmod(F.xxhash64("vec_id", F.lit(seed)), F.lit(n_clusters))
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    comp = F.transform(
        idx,
        lambda j: (
            F.pmod(F.xxhash64(F.lit("ctr"), F.col("_c"), j), F.lit(2000)) / 1000.0
            - 1.0
        )
        + (
            F.pmod(F.xxhash64(F.lit("jit"), F.col("vec_id"), j), F.lit(2000)) / 1000.0
            - 1.0
        )
        * jitter,
    )
    return withc.select("vec_id", comp.alias("embedding"))
