"""Text analysis + dedup operators over deterministic synthetic documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_verify,
    minhash_candidates,
    minhash_dedup,
    minhash_signature,
    minhash_signature_table,
    shingles,
    simhash,
    simhash_table,
)
from amanogawa_spark.operators.text import (
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    quality_features,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The  quick brown   fox jumps over the lazy DOG"),  # normalized dup of 0
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup (1 word)
        (4, "der hund und die katze sind nicht zu hause mit dem ball"),
        (5, "completely different content about spark dataframes and shuffles"),
        (6, "le chat et le chien sont dans la maison pour une heure"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_duplicates(docs).collect()
    dup_group = [g for g in groups if g.n_dups == 3]
    assert len(dup_group) == 1 and dup_group[0].keep_id == 0
    kept = dedup_exact(docs)
    ids = {r.doc_id for r in kept.collect()}
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert {3, 4, 5, 6, 7} <= ids


def test_token_counts(spark, docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", token_count("text").alias("n")).collect()}
    assert got[0] == 9
    assert got[7] == 0
    bpe = docs.select("doc_id", bpe_ish_token_count("text").alias("n")).collect()
    assert {r.doc_id: r.n for r in bpe}[0] == 9


def test_quality_and_language(spark, docs):
    q = quality_features(docs).collect()
    by_id = {r.doc_id: r for r in q}
    assert by_id[0].stopword_ratio > 0.2  # 'the' x2 + 'over' -> >= 2/9
    assert by_id[7].n_tokens == 0
    langs = {r.doc_id: r.lang_pred for r in detect_language(docs).collect()}
    assert langs[0] == "en"
    assert langs[4] == "de"
    assert langs[6] == "fr"
    assert langs[7] == "und"


def test_fingerprint_normalization(spark, docs):
    fps = {r.doc_id: r.fp for r in docs.select("doc_id", fingerprint("text").alias("fp")).collect()}
    assert fps[0] == fps[1] == fps[2]
    assert fps[0] != fps[3]


def test_shingles(spark, docs):
    sh = docs.filter(F.col("doc_id") == 0).select(shingles("text", 3).alias("s")).first().s
    assert "the quick brown" in sh
    assert len(sh) == 7  # 9 tokens -> 7 trigrams


def test_minhash_near_dup_pipeline(spark, docs):
    # banding math: the (0,3) pair has trigram Jaccard 0.4 (4 shared / 10
    # union), so 32 bands x 2 rows gives P(collide) ≈ 1-(1-0.4^2)^32 ≈ 0.996
    cand = minhash_candidates(docs, num_hashes=64, bands=32)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (0, 1) in pairs and (0, 2) in pairs  # exact dups always collide
    assert (0, 3) in pairs  # near dup at J=0.4
    verified = jaccard_verify(cand, docs, threshold=0.35)
    vpairs = {(r.id_a, r.id_b) for r in verified.collect()}
    assert (0, 1) in vpairs and (0, 3) in vpairs
    assert all(p[0] != 5 and p[1] != 5 for p in vpairs)  # unique doc never verified
    # exact-jaccard values: identical docs = 1.0, near dup = 0.4
    vals = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert vals[(0, 1)] == 1.0
    assert abs(vals[(0, 3)] - 0.4) < 1e-9
    deduped = minhash_dedup(docs, num_hashes=64, bands=32, threshold=0.35)
    ids = {r.doc_id for r in deduped.collect()}
    assert 0 in ids and {1, 2, 3}.isdisjoint(ids)
    assert {4, 5, 6} <= ids


def test_simhash_near_dup(spark, docs):
    sh = {r.doc_id: r.sh for r in docs.select("doc_id", simhash("text").alias("sh")).collect()}
    assert sh[0] == sh[1] == sh[2]
    # near-dup differs in few bits; unrelated differs in many
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(sh[0], sh[3]) < ham(sh[0], sh[5])


def test_minhash_table_equals_column_form(spark, docs):
    """The scalable agg formulation must produce byte-identical signatures
    to the column-expression form (same seeded hashes, same minima)."""
    old = {
        r.id: list(r.sig)
        for r in docs.select(
            F.col("doc_id").alias("id"),
            minhash_signature(shingles("text", 3), 16).alias("sig"),
        ).collect()
    }
    new = {
        r.id: list(r.sig)
        for r in minhash_signature_table(docs, num_hashes=16).collect()
    }
    assert old == new


def test_simhash_table_equals_column_form(spark, docs):
    old = {
        r.id: r.sh
        for r in docs.select(
            F.col("doc_id").alias("id"), simhash("text").alias("sh")
        ).collect()
    }
    new = {r.id: r.sh for r in simhash_table(docs).collect()}
    assert old == new


def test_simhash_table_null_text_parity(spark):
    """NULL-text documents must neither vanish (explode dropping) nor hash
    to a non-zero sketch (xxhash64(NULL)==seed trap) — both forms give 0."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "some text here")], "doc_id long, text string"
    )
    old = {
        r.id: r.sh
        for r in df.select(
            F.col("doc_id").alias("id"), simhash("text").alias("sh")
        ).collect()
    }
    new = {r.id: r.sh for r in simhash_table(df).collect()}
    assert set(new) == {1, 2, 3}  # nothing dropped
    assert old == new
    assert new[1] == 0


def test_minhash_max_bucket_guard(spark):
    """max_bucket_size drops hot band buckets (boilerplate clones) while
    small buckets keep producing candidates."""
    from amanogawa_spark.operators.dedup import minhash_candidates

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = [(i, boiler) for i in range(30)]  # one hot bucket per band
    rows += [
        (100, "zebra quantum xylophone gradient parquet shuffle executor node rank"),
        (101, "zebra quantum xylophone gradient parquet shuffle executor node rank extra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    unguarded = {
        (r.id_a, r.id_b) for r in minhash_candidates(df).collect()
    }
    assert (100, 101) in unguarded
    assert any(a < 30 and b < 30 for a, b in unguarded)
    guarded = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(df, max_bucket_size=10).collect()
    }
    assert (100, 101) in guarded  # small bucket survives
    assert not any(a < 30 and b < 30 for a, b in guarded)  # hot bucket cut


def test_cluster_duplicates_transitive(spark):
    """A~B and B~C must land A, B, C in ONE cluster even without an A~C pair."""
    from amanogawa_spark.operators.dedup import cluster_duplicates

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster for r in cluster_duplicates(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_duplicate_ngram_spans_and_stats(spark):
    """Hand-built corpus: a 5-gram shared by docs 1 and 2, an intra-doc
    repeat in doc 3, and a fully unique doc 4."""
    from amanogawa_spark.operators.dedup import dup_span_stats, duplicate_ngram_spans

    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, shared + " zeta eta"),
            (2, "prefix words here " + shared),
            (3, "x y z w v " + "x y z w v"),  # repeats its own 5-gram
            (4, "totally unique content with nothing repeated anywhere ever"),
            (5, "tiny"),  # < 5 tokens: no grams
        ],
        "doc_id long, text string",
    )
    spans = duplicate_ngram_spans(docs, n=5).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.gram))
    # docs 1 and 2 share `shared` at positions 0 and 3 respectively
    assert (0, shared) in by_doc[1]
    assert (3, shared) in by_doc[2]
    # doc 3's self-repeat: positions 0 and 5 hold the same 5-gram
    assert {(0, "x y z w v"), (5, "x y z w v")} <= by_doc[3]
    assert 4 not in by_doc

    stats = {r.doc_id: r for r in dup_span_stats(docs, n=5).collect()}
    assert stats[4].n_dup_grams == 0 and stats[4].dup_frac == 0.0
    assert stats[5].n_grams == 0 and stats[5].dup_frac == 0.0
    assert stats[1].n_dup_grams >= 1
    assert 0 < stats[1].dup_frac <= 1.0


def test_containment_verify_quote_detection(spark):
    """A short doc embedded in a long one: containment ~1 one way, Jaccard low."""
    from amanogawa_spark.operators.dedup import containment_verify, jaccard_verify

    short = "alpha beta gamma delta"
    long_ = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame([(0, short), (1, long_)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    got = containment_verify(pairs, docs, shingle_n=2, threshold=0.5).collect()
    assert len(got) == 1
    r = got[0]
    assert r["cont_ab"] == 1.0          # every shingle of the short doc is in the long
    assert r["cont_ba"] < 0.1           # but not vice versa
    # Jaccard at the same threshold misses this pair entirely
    assert jaccard_verify(pairs, docs, shingle_n=2, threshold=0.5).count() == 0


def test_containment_symmetric_identical_docs(spark):
    from amanogawa_spark.operators.dedup import containment_verify

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "zz qq")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 1), (0, 2)], ["id_a", "id_b"])
    rows = {(r["id_a"], r["id_b"]): r for r in
            containment_verify(pairs, docs, shingle_n=2, threshold=0.9).collect()}
    assert set(rows) == {(0, 1)}
    assert rows[(0, 1)]["cont_ab"] == 1.0 and rows[(0, 1)]["cont_ba"] == 1.0


def test_remove_duplicated_spans_cuts_and_counts(spark):
    from amanogawa_spark.operators.dedup import remove_duplicated_spans

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps into the river bed"),
        (2, "totally unique words here only once ever written"),
        (3, "tiny"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in remove_duplicated_spans(df, n=5).collect()}
    # docs 0/1 share the 5-gram "the quick brown fox jumps": cut from both
    assert got[0] == ("over the lazy dog", 9, 5)
    assert got[1] == ("into the river bed", 9, 5)
    assert got[2] == ("totally unique words here only once ever written", 8, 0)
    assert got[3] == ("tiny", 1, 0)


def test_remove_duplicated_spans_full_removal_and_overlap(spark):
    from amanogawa_spark.operators.dedup import remove_duplicated_spans

    # identical docs: every position is a duplicated 3-gram -> all removed;
    # overlapping spans must merge, not double-count
    docs = [(0, "a b c d"), (1, "a b c d")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in remove_duplicated_spans(df, n=3).collect()}
    assert got[0] == ("", 4, 4) and got[1] == ("", 4, 4)


def test_select_representatives_keeps_best_scored(spark):
    from amanogawa_spark.operators.dedup import select_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], ["id", "cluster"]
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (8, 0.5)], ["id", "score"]
    )  # id 7 unscored -> ranks last in its cluster
    got = {r["id"]: r["keep"] for r in select_representatives(clusters, scores).collect()}
    assert got == {1: False, 2: True, 3: False, 7: False, 8: True}


def test_line_dedup_keep_first_occurrence(spark):
    from amanogawa_spark.operators.dedup import line_dedup

    docs = [
        (1, "alpha\nCOMMON LINE\nbeta"),
        (2, "common line\ngamma\ncommon line"),
        (3, "delta\ncommon   LINE"),
        (4, "unique only"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in line_dedup(df).collect()}
    # "common line" (normalized) occurs 4x; only the first (doc 1, line 1)
    # survives, with its ORIGINAL bytes — dedup keys on normalized text but
    # emits the raw line
    assert got[1] == ("alpha\nCOMMON LINE\nbeta", 3, 0)
    assert got[2] == ("gamma", 3, 2)
    assert got[3] == ("delta", 2, 1)
    assert got[4] == ("unique only", 1, 0)


def test_line_dedup_full_removal_and_min_count(spark):
    from amanogawa_spark.operators.dedup import line_dedup

    docs = [(0, "x\ny"), (1, "x\ny"), (2, "x\ny")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in line_dedup(df).collect()}
    # doc 0 holds both first occurrences; docs 1-2 lose every line but
    # still come back as rows with empty text
    assert got[0] == ("x\ny", 2, 0)
    assert got[1] == ("", 2, 2) and got[2] == ("", 2, 2)
    # min_count=4: three occurrences are below the removal threshold
    kept_all = {r["doc_id"]: r["n_removed"] for r in line_dedup(df, min_count=4).collect()}
    assert kept_all == {0: 0, 1: 0, 2: 0}


def test_line_dedup_null_text_keeps_document(spark):
    """A NULL text document must still yield its one contracted output row
    (F.split(NULL) would otherwise drop it from totals AND the output —
    silent data loss through the config line_dedup flow)."""
    from amanogawa_spark.operators.dedup import line_dedup

    docs = [(0, "x\ny"), (1, None), (2, "x\nz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: tuple(r)[1:] for r in line_dedup(df).collect()}
    assert set(got) == {0, 1, 2}
    # NULL text is treated as the empty document: one (empty) line
    assert got[1][0] == "" and got[1][1] == 1


def test_line_dedup_metachar_delimiter_is_literal(spark):
    """Regex-metachar delimiters split literally: '|' must NOT split per
    character, and surviving text must reassemble byte-identically."""
    from amanogawa_spark.operators.dedup import line_dedup

    docs = [(0, "alpha|beta|gamma"), (1, "alpha|delta")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in line_dedup(df, delimiter="|").collect()}
    # "alpha" occurs twice -> doc 0 keeps it (first occurrence), doc 1 loses it
    assert got[0] == ("alpha|beta|gamma", 3, 0)
    assert got[1] == ("delta", 2, 1)
    # round-trip sanity: a doc with no duplicated lines is byte-identical
    solo = spark.createDataFrame([(9, "a.b|c.d")], ["doc_id", "text"])
    (row,) = line_dedup(solo, delimiter="|").collect()
    assert row["clean_text"] == "a.b|c.d" and row["n_lines"] == 2


def test_line_dedup_repartition_invariant(spark):
    from amanogawa_spark.operators.dedup import line_dedup

    docs = [(i, f"shared line\nuniq {i}\nshared line") for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = sorted(tuple(r) for r in line_dedup(df).collect())
    b = sorted(tuple(r) for r in line_dedup(df.repartition(7, "text")).collect())
    assert a == b
    # exactly one "shared line" survives corpus-wide (doc 0 had the min id)
    survivors = [r for r in a if "shared line" in r[1]]
    assert len(survivors) == 1 and survivors[0][0] == 0
