"""Deterministic Common-Crawl-style pages fixture (FIXTURES.md §1).

Synthesizes a pages table ``(url, warc_ts, html, text, lang)`` whose HTML
plants a *known* link structure and a *known* body text block, so that

- link extraction has an exact expected edge set (reference semantics:
  records → deduped (src, dst) edge table,
  ``plugin/flow/to_graph/to_graph.cpp:82-86, 174-196``),
- text extraction has a byte-identical oracle (the ``text`` column),
- graph algorithms have non-trivial answers: Zipf-skewed hub domains,
  preferential attachment, dangling pages, self-links (must be dropped),
  duplicate links (must be deduped), and >= 2 disconnected components.

Pure function of (n_pages, seed): the generator uses only
``random.Random`` and integer arithmetic, so it is stable across
platforms and runs. No Spark required to generate.
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import random
from dataclasses import dataclass, field

import pandas as pd

LANGS = ["en", "ja", "de", "fr", "es"]

_WORDS = (
    "river galaxy silver node spark graph crawl page link rank star cluster "
    "vector stream shard anchor index query table column merge join scan"
).split()


@dataclass
class PagesCorpus:
    """The generated corpus plus its ground truth."""

    pages: pd.DataFrame  # url, warc_ts, html, text, lang
    # exact expected directed edge set AFTER self-loop drop + dedup, as urls
    expected_edges: set[tuple[str, str]] = field(default_factory=set)


def _domain_for(i: int, n_domains: int, rng: random.Random) -> str:
    """Zipf(s~1.2)-ish domain draw: a few hub domains own most pages."""
    # inverse-CDF sampling over 1/k^1.2 weights, precomputed small table
    r = rng.random()
    total = sum(1.0 / (k**1.2) for k in range(1, n_domains + 1))
    acc = 0.0
    for k in range(1, n_domains + 1):
        acc += (1.0 / (k**1.2)) / total
        if r <= acc:
            return f"d{k}.example.org"
    return f"d{n_domains}.example.org"


def _body_text(i: int, rng: random.Random) -> str:
    n_words = 20 + rng.randrange(60)
    words = [_WORDS[rng.randrange(len(_WORDS))] for _ in range(n_words)]
    return f"page {i} :: " + " ".join(words)


def generate_pages(
    n_pages: int = 1000,
    seed: int = 7,
    n_domains: int = 20,
    dangling_frac: float = 0.08,
    second_component_frac: float = 0.1,
) -> PagesCorpus:
    rng = random.Random(seed)
    n_b = max(3, int(n_pages * second_component_frac))  # isolated component B
    n_a = n_pages - n_b

    urls = []
    for i in range(n_pages):
        dom = _domain_for(i, n_domains, rng)
        urls.append(f"https://{dom}/p{i}")

    texts = [_body_text(i, rng) for i in range(n_pages)]
    langs = [LANGS[rng.randrange(len(LANGS))] for _ in range(n_pages)]

    # link targets: component A pages link within [0, n_a), B within [n_a, n)
    expected: set[tuple[str, str]] = set()
    raw_links: list[list[str]] = []
    for i in range(n_pages):
        if rng.random() < dangling_frac:
            raw_links.append([])
            continue
        lo, hi = (0, n_a) if i < n_a else (n_a, n_pages)
        out_deg = 1 + rng.randrange(6)
        targets: list[str] = []
        for _ in range(out_deg):
            if rng.random() < 0.6 and i > lo + 1:
                # preferential-attachment-ish: bias to low ordinals in range
                j = lo + int((rng.random() ** 2) * (min(i, hi - 1) - lo))
            else:
                j = lo + rng.randrange(hi - lo)
            targets.append(urls[j])
        # plant a self-link sometimes (must be dropped downstream)
        if rng.random() < 0.15:
            targets.append(urls[i])
        # plant a duplicate link sometimes (must be deduped downstream)
        if targets and rng.random() < 0.3:
            targets.append(targets[0])
        raw_links.append(targets)
        for t in targets:
            if t != urls[i]:
                expected.add((urls[i], t))

    htmls, warc_ts = [], []
    epoch = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
    for i in range(n_pages):
        anchors = "".join(
            f'<a href="{t}">link</a>\n' for t in raw_links[i]
        )
        page = (
            "<!DOCTYPE html><html><head><title>"
            f"page {i}</title></head><body>\n"
            f'<p id="body">{_html.escape(texts[i])}</p>\n'
            f"{anchors}</body></html>"
        )
        htmls.append(page.encode("utf-8"))
        warc_ts.append(epoch + _dt.timedelta(seconds=i * 17))

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(warc_ts, dtype="datetime64[us, UTC]"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )
    return PagesCorpus(pages=pages, expected_edges=expected)


def write_pages_parquet(path: str, n_pages: int = 1000, seed: int = 7) -> PagesCorpus:
    corpus = generate_pages(n_pages=n_pages, seed=seed)
    corpus.pages.to_parquet(path, index=False)
    return corpus
