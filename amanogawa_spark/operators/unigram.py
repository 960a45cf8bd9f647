"""SentencePiece-style unigram-LM subword tokenizer (Kudo '18).

The second production tokenizer family next to BPE (``operators/bpe.py``):
instead of greedy merges, a unigram language model over a candidate piece
inventory is fit by EM, low-value pieces are pruned, and encoding is the
Viterbi-best segmentation under the fitted piece probabilities. LLaMA/T5
class models tokenize with exactly this scheme.

Distributed shape — the corpus is touched ONCE (the word-count aggregate,
shared with BPE's ``word_vocab``); everything after runs over the
DISTINCT-WORD table, which Zipf's law keeps orders of magnitude smaller
than the corpus:

- **candidates**: every substring (length ≤ ``max_piece_len``) of every
  distinct word, weighted by word count — two nested ``explode``s over
  integer sequences + one map-side-combined aggregate. No Python.
- **E-step**: exact forward-backward over each word under the current
  piece probabilities — per-word dynamic programming, so an Arrow-batched
  ``mapInPandas`` over the word table with the (model-sized) piece table
  broadcast in the closure; expected piece counts come back through one
  map-side-combined aggregate. Probability-space DP is safe unscaled:
  words are bounded (``max_word_len``) and piece probs ≥ 1/corpus, so the
  smallest path mass stays far above the double denormal floor.
- **M-step**: normalize expected counts — an O(|pieces|) driver collect
  per round, the same model-sized-traffic contract as
  ``classifier_train``/BPE's local merge loop. The corpus and the word
  table never reshuffle.
- **encode**: Viterbi DP over DISTINCT words only (same ``mapInPandas``
  shape), then one broadcast join back onto token occurrences — each
  unique word is segmented once per job no matter how often it occurs.

Engine-portability: candidate counts are integers; the seed model is a
single exact division; forward-backward and Viterbi are fixed-round IEEE
arithmetic — the DuckDB oracle mirrors them with unrolled position CTEs
(prob-space sums / max-DP), and results compare after in-query rounding.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.operators.bpe import word_vocab


def candidate_pieces(
    wc: DataFrame,
    max_piece_len: int = 6,
    min_count: int = 2,
) -> DataFrame:
    """(piece, cnt) — corpus-weighted substring counts over the distinct
    word table. Single characters are always kept (they guarantee every
    word stays segmentable); multi-char pieces need ``min_count``."""
    w = wc.select("word", "cnt", F.length("word").alias("n"))
    st = w.select(
        "word", "cnt", "n", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("s")
    )
    sub = st.select(
        "word",
        "cnt",
        "s",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(max_piece_len), F.col("n") - F.col("s") + 1),
            )
        ).alias("l"),
    ).select(F.expr("substring(word, s, l)").alias("piece"), "cnt")
    counts = sub.groupBy("piece").agg(F.sum("cnt").alias("cnt"))
    return counts.filter(
        (F.col("cnt") >= min_count) | (F.length("piece") == 1)
    )


def seed_probs(cands: DataFrame) -> dict[str, float]:
    """Count-normalized initial piece probabilities — the deterministic
    EM starting point (one exact division per piece; model-sized
    collect)."""
    rows = cands.collect()
    total = float(sum(r["cnt"] for r in rows))
    return {r["piece"]: r["cnt"] / total for r in rows}


def _forward_backward(word: str, probs: dict[str, float], klen: int):
    """Exact E-step DP for one word: returns (loglik, {piece: expected
    occurrences}). Probability space (see module docstring)."""
    n = len(word)
    f = [0.0] * (n + 1)
    f[0] = 1.0
    for i in range(1, n + 1):
        acc = 0.0
        for j in range(max(0, i - klen), i):
            p = probs.get(word[j:i])
            if p:
                acc += f[j] * p
        f[i] = acc
    if f[n] <= 0.0:
        return None, {}
    b = [0.0] * (n + 1)
    b[n] = 1.0
    for i in range(n - 1, -1, -1):
        acc = 0.0
        for l in range(1, min(klen, n - i) + 1):
            p = probs.get(word[i : i + l])
            if p:
                acc += p * b[i + l]
        b[i] = acc
    exp: dict[str, float] = {}
    for j in range(n):
        if f[j] == 0.0:
            continue
        for l in range(1, min(klen, n - j) + 1):
            piece = word[j : j + l]
            p = probs.get(piece)
            if p:
                exp[piece] = exp.get(piece, 0.0) + f[j] * p * b[j + l] / f[n]
    return math.log(f[n]), exp


def expected_counts(
    wc: DataFrame, probs: dict[str, float], max_piece_len: int = 6
) -> DataFrame:
    """(piece, expcnt) — one distributed E-step: forward-backward over
    every distinct word (Arrow batches, piece model in the closure),
    expected occurrences weighted by word count, map-side combined."""
    spark = wc.sparkSession
    klen = int(max_piece_len)
    bprobs = spark.sparkContext.broadcast(probs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pr = bprobs.value
        for pdf in batches:
            agg: dict[str, float] = {}
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                _, exp = _forward_backward(word, pr, klen)
                for piece, e in exp.items():
                    agg[piece] = agg.get(piece, 0.0) + e * float(cnt)
            yield pd.DataFrame(
                {"piece": list(agg.keys()), "expcnt": list(agg.values())}
            )

    part = wc.select("word", "cnt").mapInPandas(run, "piece string, expcnt double")
    return part.groupBy("piece").agg(F.sum("expcnt").alias("expcnt"))


def corpus_loglik(
    wc: DataFrame, probs: dict[str, float], max_piece_len: int = 6
) -> float:
    """Σ cnt·ln p(word) under the current model — the EM convergence
    scalar (non-decreasing per round). One pass over the word table."""
    spark = wc.sparkSession
    klen = int(max_piece_len)
    bprobs = spark.sparkContext.broadcast(probs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pr = bprobs.value
        for pdf in batches:
            ll = 0.0
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                lw, _ = _forward_backward(word, pr, klen)
                if lw is not None:
                    ll += lw * float(cnt)
            yield pd.DataFrame({"ll": [ll]})

    rows = (
        wc.select("word", "cnt")
        .mapInPandas(run, "ll double")
        .agg(F.sum("ll").alias("ll"))
        .collect()
    )
    return float(rows[0]["ll"] or 0.0)


def unigram_train(
    docs: DataFrame,
    rounds: int = 3,
    vocab_size: int | None = None,
    max_piece_len: int = 6,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, float]:
    """Fit the unigram LM: candidates → count-normalized seed → ``rounds``
    of distributed EM → optional prune to the top ``vocab_size`` pieces
    by (prob desc, piece asc), single characters always retained,
    renormalized. Returns {piece: prob}."""
    wc = word_vocab(docs, id_col=id_col, text_col=text_col).persist()
    probs = seed_probs(candidate_pieces(wc, max_piece_len, min_count))
    for _ in range(rounds):
        rows = expected_counts(wc, probs, max_piece_len).collect()
        total = float(sum(r["expcnt"] for r in rows))
        probs = {r["piece"]: r["expcnt"] / total for r in rows if r["expcnt"] > 0.0}
    wc.unpersist()
    if vocab_size is not None:
        chars = {p: q for p, q in probs.items() if len(p) == 1}
        multi = sorted(
            ((p, q) for p, q in probs.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(0, vocab_size - len(chars))]
        kept = dict(multi) | chars
        z = sum(kept.values())
        probs = {p: q / z for p, q in kept.items()}
    return probs


def _viterbi(word: str, logp: dict[str, float], klen: int):
    """Best segmentation under the model: (pieces, score). Ties keep the
    smallest predecessor index (deterministic; score is tie-invariant)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - klen), i):
            lp = logp.get(word[j:i])
            if lp is not None and best[j] + lp > best[i]:
                best[i] = best[j] + lp
                back[i] = j
    if best[n] == -math.inf:
        return None, None
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1], best[n]


def unigram_encode_words(
    words: DataFrame, probs: dict[str, float], max_piece_len: int = 6
) -> DataFrame:
    """(word, pieces array<string>, n_pieces, logp) — Viterbi-segment each
    DISTINCT word once (Arrow batches, model broadcast). Unsegmentable
    words (characters outside the model) emit no row."""
    spark = words.sparkSession
    klen = int(max_piece_len)
    logp = {p: math.log(q) for p, q in probs.items() if q > 0.0}
    blogp = spark.sparkContext.broadcast(logp)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = blogp.value
        for pdf in batches:
            out_w, out_p, out_n, out_s = [], [], [], []
            for word in pdf["word"]:
                pieces, score = _viterbi(word, lp, klen)
                if pieces is None:
                    continue
                out_w.append(word)
                out_p.append(pieces)
                out_n.append(len(pieces))
                out_s.append(score)
            yield pd.DataFrame(
                {
                    "word": out_w,
                    "pieces": out_p,
                    "n_pieces": out_n,
                    "logp": out_s,
                }
            )

    return words.select("word").distinct().mapInPandas(
        run, "word string, pieces array<string>, n_pieces int, logp double"
    )


def unigram_encode(
    docs: DataFrame,
    probs: dict[str, float],
    max_piece_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int | None = None,
) -> DataFrame:
    """(id, n_words, n_pieces, total_logp) per document: per-doc roll-up
    of the Viterbi segmentation — distinct words segmented once, then one
    broadcast join onto the token occurrences. ``max_word_len`` drops
    longer tokens up front (pathological unbroken strings would otherwise
    dominate the per-word DP)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = (
        docs.select(F.col(id_col).alias("id"), F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.length("word") > 0)
    )
    if max_word_len is not None:
        toks = toks.filter(F.length("word") <= max_word_len)
    seg = unigram_encode_words(toks.select("word"), probs, max_piece_len)
    return (
        toks.join(F.broadcast(seg.select("word", "n_pieces", "logp")), "word")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.sum("logp").alias("total_logp"),
        )
    )
