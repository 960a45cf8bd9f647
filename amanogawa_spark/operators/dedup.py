"""Deduplication operators for web-scale corpora.

- exact: hash-groupBy on a normalized fingerprint (one shuffle).
- MinHash + LSH: shingle → k minhashes → band buckets → candidate pairs
  via bucket self-join → Jaccard verify. The self-join is on (band,
  signature-slice) so only near-dup candidates ever meet — the standard
  way to avoid the O(n^2) pair explosion at 100 TB.
- SimHash: 64-bit hyperplane-free sketch from token hashes; near-dups =
  identical sketch in any of 4 16-bit bands (Hamming ≤ 3-ish recall).
- n-gram Jaccard: exact verify step (and small-scale standalone dedup).

Minhashing runs inside Catalyst: per-shingle hashes via ``xxhash64`` with
per-permutation seeds, ``array_min`` per permutation — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-equal (normalized) documents: (dup_key, keep_id, n_dups).

    keep_id = min id per group — the canonical survivor. Rows with n_dups=1
    are unique. One hash shuffle on a 128-bit fingerprint (two independently
    seeded xxhash64 halves): a single 64-bit key has expected birthday
    collisions ~N²/2^65 — tens of thousands of silently-dropped distinct
    docs at 10^12 scale; two independent halves push that to ~N²/2^129.

    The salt literal must come FIRST: Spark's multi-arg xxhash64 chains
    arguments with the running hash as seed, so ``xxhash64(lit(i), norm)``
    hashes the text under a distinct per-salt seed chain. With the salt
    last, both halves would be pure functions of the single 64-bit
    ``H(norm)`` and a collision there would collide both halves at once.
    """
    norm = normalized_text(text_col)
    keyed = df.select(
        F.col(id_col),
        F.struct(
            F.xxhash64(F.lit(1), norm).alias("h1"),
            F.xxhash64(F.lit(2), norm).alias("h2"),
        ).alias("dup_key"),
    )
    return keyed.groupBy("dup_key").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups")
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each exact-dup group."""
    keep = exact_duplicates(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) from normalized text."""
    toks = F.split(normalized_text(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_id, n_shingles, novel_frac) — corpus-level n-gram novelty.

    ``novel_frac`` = fraction of a document's distinct word ``n``-grams
    that appear in NO other document — the diversity/boilerplate signal
    curation pipelines threshold on (low novelty ⇒ template/boilerplate
    text; near 1.0 ⇒ original content). Complements
    :func:`contamination_flags` (overlap vs a benchmark) and
    repetition_features (intra-document repetition).

    Scale shape: explode + two aggregates (shingle doc-frequency, then
    per-doc novelty) — both map-side combinable; no joins against the
    text itself, only against the exploded shingle stream.
    """
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("s"))
    docfreq = sh.groupBy("s").agg(F.countDistinct(id_col).alias("df"))
    return (
        sh.join(docfreq, "s")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            (
                F.sum((F.col("df") == 1).cast("long")) / F.count("*")
            ).alias("novel_frac"),
        )
    )


def duplicate_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, pos, gram) — every position whose word ``n``-gram occurs
    more than once in the corpus (any doc, any position, self included).

    The exact-substring-dedup primitive at n-gram granularity
    (RefinedWeb/Lee et al.-style span removal without a distributed
    suffix array): a repeated n-gram marks a duplicated span [pos,
    pos+n) that a curation pass can mask or cut. Positions are 0-based
    token offsets into the normalized token stream.

    Scale shape: explode positions (corpus token count rows), ONE
    map-side-combined count per gram, one semi-join back — no pairwise
    comparison anywhere.
    """
    toks = F.split(normalized_text(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") >= n
    )
    grams = base.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.size("toks") - n)).alias("pos"),
        F.col("toks"),
    ).select(
        id_col,
        "pos",
        F.array_join(F.expr(f"slice(toks, pos + 1, {n})"), " ").alias("gram"),
    )
    occ = grams.groupBy("gram").agg(F.count("*").alias("occ")).filter(
        F.col("occ") >= 2
    )
    return grams.join(occ.select("gram"), "gram", "left_semi").select(
        id_col, "pos", "gram"
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, n_grams, n_dup_grams, dup_frac) — per-doc duplicated-span
    pressure. Docs with fewer than ``n`` tokens report 0 grams, frac 0.0."""
    toks = F.split(normalized_text(text_col), " ")
    totals = df.select(
        F.col(id_col),
        F.greatest(F.size(toks) - n + 1, F.lit(0)).cast("long").alias("n_grams"),
    )
    dups = (
        duplicate_ngram_spans(df, id_col, text_col, n)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_grams"))
    )
    return totals.join(dups, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.when(
            F.col("n_grams") > 0,
            F.coalesce("n_dup_grams", F.lit(0)) / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def select_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """(id, cluster, keep) — quality-aware survivor choice per near-dup
    cluster: keep the HIGHEST-scoring member (ties → smallest id) instead
    of the default smallest-id survivor.

    ``clusters``: :func:`cluster_duplicates` output (id, cluster);
    ``scores``: (id, score) from any quality signal (classifier score, LM
    log-prob, token count…). Members missing a score rank last (NULLs
    sort after values under DESC). One join + one bounded window per
    cluster — cluster sizes are near-dup group sizes, tiny by nature.
    """
    from pyspark.sql.window import Window

    joined = clusters.join(
        scores.select(F.col(id_col).alias("id"), F.col(score_col).alias("_s")),
        "id",
        "left",
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc_nulls_last("_s"), F.asc("id")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .select("id", "cluster", (F.col("_rn") == 1).alias("keep"))
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, clean_text, n_tokens, n_removed) — cut every corpus-repeated
    word ``n``-gram span out of the normalized text (the removal half of
    :func:`duplicate_ngram_spans`; RefinedWeb/Lee-et-al-style exact
    substring dedup applied in place).

    A token is removed iff it lies inside ANY duplicated span [pos,
    pos+n). Surviving tokens re-join in order with single spaces — offsets
    are over the normalized token stream, matching the detector.

    Scale shape: the detector's aggregate + semi-join, then ONE groupBy
    collecting each doc's covered-index array (bounded by the doc's own
    token count), and a pure-Catalyst filter/rebuild per row. Documents
    with no duplicated spans pass through the join as NULL and rebuild
    unchanged.
    """
    toks = F.split(normalized_text(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("toks"))
    spans = duplicate_ngram_spans(df, id_col, text_col, n)
    covered = (
        spans.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("idx"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("idx")).alias("cov"))
    )
    joined = base.join(covered, id_col, "left").withColumn(
        "cov", F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    )
    tw = F.arrays_zip(
        F.col("toks").alias("tok"),
        F.sequence(F.lit(0), F.size("toks") - 1).alias("idx"),
    )
    kept = F.filter(tw, lambda t: ~F.array_contains(F.col("cov"), t["idx"]))
    return joined.select(
        id_col,
        F.array_join(F.transform(kept, lambda t: t["tok"]), " ").alias("clean_text"),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_hits, contaminated) — eval-set decontamination screening.

    A training doc is flagged when it shares >= 1 word ``n``-gram with any
    benchmark document (the standard n-gram-overlap contamination test,
    n=8..13 in published pipelines; GPT-3 paper §C used 13-gram spans).

    Scale shape: the benchmark shingle set is tiny relative to the corpus
    (thousands of eval docs vs 10^12 training docs) — it is distinct-ed
    and BROADCAST, so the corpus side streams through a map-side hash
    join of its exploded shingles with no shuffle of document text;
    n_hits aggregates back on the already-partitioned doc id. Flagged
    ids then drive an anti-join upstream (the docs frame is returned
    keyed, not rewritten, so callers choose drop vs audit).
    """
    bench_grams = (
        benchmark.select(
            F.explode(shingles(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "inner")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def cluster_duplicates(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id, cluster) — transitive near-duplicate clusters from a verified
    pair list (LSH/Jaccard/embedding output): cluster = min doc id of the
    connected component. THE finalization step of every near-dedup
    pipeline — pairwise matches alone under-remove, because A~B and B~C
    puts A,C in one cluster even when A~C was never emitted (band
    collision missed). Keep ``cluster`` as the survivor id and anti-join
    the rest.

    Runs the small-star/large-star components over the pair graph, so the
    clustering inherits its O(log² n) round bound — no union-find on the
    driver, no connectivity via iterative self-joins on the full corpus
    (only ids that appear in a pair participate).
    """
    from amanogawa_spark.graph.components import connected_components

    edges = pairs.select(
        F.col(id_a).alias("src_id"), F.col(id_b).alias("dst_id")
    )
    verts = (
        edges.select(F.col("src_id").alias("id"))
        .unionAll(edges.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    return connected_components(verts, edges).select(
        "id", F.col("component").alias("cluster")
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """array<long> of length num_hashes: min over shingles of seeded xxhash64.

    Column-expression form — convenient for small inputs, but Catalyst
    substitutes ``shingle_col`` into all ``num_hashes`` branches and
    evaluates the whole shingling num_hashes times per row, interpreted
    (higher-order funcs break whole-stage codegen). For corpora use
    :func:`minhash_signature_table` (measured ~100x faster at sf0.1).
    """
    def _perm(i: int):
        # closure factory: a 1-arg lambda per permutation (a default-arg
        # lambda would be read by Spark as the (element, index) 2-arg form)
        return lambda s: F.xxhash64(s, F.lit(i))

    sigs = [
        F.array_min(F.transform(shingle_col, _perm(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the input up to the session's shuffle parallelism when it
    arrives under-partitioned (e.g. one small parquet file) — per-row heavy
    operators must never run single-task. No-op when already parallel, so
    at real scale (many input splits) it costs nothing."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def _perm_hash(s: Column, i: int, hash: str) -> Column:
    """Per-permutation shingle hash. 'xxhash64' (production: cheapest, JVM
    codegen) or 'md5' (engine-portable: lowercase hex strings order
    lexicographically == numerically at fixed length, so MIN over them is a
    valid minhash AND a DuckDB oracle computes the identical signature)."""
    if hash == "md5":
        return F.md5(F.encode(F.concat(F.lit(f"{i}:"), s), "UTF-8"))
    return F.xxhash64(s, F.lit(i))


def minhash_signature_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    hash: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long|string>) — the scalable minhash formulation.

    Shingles are exploded once, each hashed ``num_hashes`` times with flat
    hash calls (whole-stage codegen), and the per-permutation minima come
    from ONE hash aggregate with map-side partial combine — the shuffle
    carries only num_hashes values per doc per map partition. Identical
    values to :func:`minhash_signature` (for hash='xxhash64').
    """
    base = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")))
    sh = base.select("id", F.explode(shingles("t", shingle_n)).alias("s"))
    sig = sh.groupBy("id").agg(
        *[F.min(_perm_hash(F.col("s"), i, hash)).alias(f"h{i}") for i in range(num_hashes)]
    )
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def banded_signatures(
    sig: DataFrame, num_hashes: int, bands: int, hash: str = "xxhash64"
) -> DataFrame:
    """(id, band, bucket) LSH band table from an (id, sig) signature table.

    Factored out of :func:`minhash_candidates` so a signature STORE from a
    previous crawl can be banded without re-reading its text (the
    incremental-dedup path). Bucket values are identical to the inline
    form the oracle mirrors.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}) — "
            "trailing hashes would be silently excluded from banding"
        )
    rows_per_band = num_hashes // bands

    def _bucket(b: int) -> Column:
        joined = F.array_join(
            F.transform(
                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            ",",
        )
        if hash == "md5":
            return F.md5(F.encode(joined, "UTF-8"))
        return F.xxhash64(joined)

    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) — docs sharing >= 1 band bucket.

    ``max_bucket_size``: drop band buckets with more members than this
    before the self-join — the banding analogue of the BoW df-cut. A hot
    bucket (boilerplate band, near-constant shingle region, adversarial
    spam) with f members contributes f² join pairs; the guard bounds the
    worst bucket's cost at B² and turns the join's upper bound into
    B²·n_buckets. Members of dropped buckets still pair through their
    other (non-hot) bands, so recall degrades only for pairs whose EVERY
    matching band is hot."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}) — "
            "trailing hashes would be silently excluded from banding"
        )
    sig = minhash_signature_table(df, id_col, text_col, num_hashes, shingle_n, hash)
    banded = banded_signatures(sig, num_hashes, bands, hash)
    if max_bucket_size is not None:
        ok = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(ok, ["band", "bucket"], "left_semi")
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs: (id_a, id_b, jaccard)."""
    sh = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))).select(
        "id", shingles("t", shingle_n).alias("sh")
    )
    pa = candidates.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
    pab = pa.join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pab.select(
            "id_a",
            "id_b",
            (inter / F.when(union > 0, union).otherwise(F.lit(1))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Directed n-gram containment on candidate pairs:
    (id_a, id_b, cont_ab, cont_ba) with C(A→B) = |A∩B| / |A|.

    The quote/subset-duplication signal Jaccard dilutes: a short document
    wholly embedded in a long one has C(short→long) ≈ 1 while Jaccard ≈
    |short|/|long| ≈ 0 — exactly the case (boilerplate wrappers, quoted
    articles, partial mirrors) RefinedWeb-style pipelines also check.
    A pair is kept when EITHER direction clears ``threshold``. Same plan
    shape as :func:`jaccard_verify` (two shingle-array joins onto the
    candidate pairs — |candidates|-sized, never all-pairs)."""
    sh = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))).select(
        "id", shingles("t", shingle_n).alias("sh")
    )
    pa = candidates.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
    pab = pa.join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    denom_a = F.when(F.size("sh_a") > 0, F.size("sh_a")).otherwise(F.lit(1))
    denom_b = F.when(F.size("sh_b") > 0, F.size("sh_b")).otherwise(F.lit(1))
    return (
        pab.select(
            "id_a",
            "id_b",
            (inter / denom_a).alias("cont_ab"),
            (inter / denom_b).alias("cont_ba"),
        )
        .filter((F.col("cont_ab") >= threshold) | (F.col("cont_ba") >= threshold))
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    hash: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → Jaccard verify → drop the
    higher id of each verified pair (union-find-free greedy for pairs)."""
    cand = minhash_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_n, hash, max_bucket_size
    )
    dups = jaccard_verify(cand, df, id_col, text_col, shingle_n, threshold)
    drop = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def simhash(col: Column | str, text_normalize: bool = True) -> Column:
    """64-bit SimHash over whitespace tokens, bit-majority per position.

    Catalyst-only: per-token xxhash64, then for each bit position sum
    (+1/-1) and take the sign. Expressed as 64 aggregates over the token
    array via ``F.aggregate`` — heavy expression tree but JVM-side.
    """
    c = normalized_text(col) if text_normalize else (F.col(col) if isinstance(col, str) else col)
    toks = F.split(c, " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def _vote(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for i in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote(i))
        bits.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", hash: str = "xxhash64"
) -> DataFrame:
    """(id, sh long) — scalable SimHash: explode tokens once, one hash per
    token, signed-bit sums in ONE map-side-combined aggregate. Identical
    values to the :func:`simhash` column form (which re-evaluates the token
    expression 64x, interpreted) for hash='xxhash64'.

    hash='md5' uses a 60-bit token hash (first 15 hex chars parsed base-16
    — fits a signed BIGINT identically in Spark and DuckDB, so the sketch
    is oracle-checkable); 'xxhash64' keeps the full 64 bits.
    """
    n_bits = 60 if hash == "md5" else 64
    base = _spread(
        df.select(F.col(id_col).alias("id"), normalized_text(text_col).alias("t"))
    )
    # explode_outer: NULL text must keep its row (plain explode would drop
    # the document). The hash must stay NULL for the NULL token — xxhash64
    # of NULL returns the seed, not NULL — so that every vote condition is
    # NULL → -1 votes → all bits 0 → sh=0, matching the column form.
    if hash == "md5":
        tok_hash = F.conv(F.substring(F.md5(F.encode(F.col("tok"), "UTF-8")), 1, 15), 16, 10).cast(
            "long"
        )
    else:
        tok_hash = F.xxhash64("tok")
    toks = base.select("id", F.explode_outer(F.split("t", " ")).alias("tok")).select(
        "id",
        F.when(F.col("tok").isNotNull(), tok_hash).alias("h"),
    )
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(n_bits)
        ]
    )
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = out.bitwiseOR(
            F.when(
                F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("id", out.alias("sh"))


def simhash_bands(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", hash: str = "xxhash64"
) -> DataFrame:
    """(id, band, band_value) — docs sharing any band are candidates.

    4 bands of 16 bits (xxhash64) or 15 bits (md5's 60-bit sketch)."""
    band_bits = 15 if hash == "md5" else 16
    mask = (1 << band_bits) - 1
    withsh = simhash_table(df, id_col, text_col, hash)
    return withsh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sh", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_value"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.band_value")


def host_dup_profile(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_urls: int = 20,
    dup_ratio_threshold: float = 0.5,
) -> DataFrame:
    """(host, n_urls, n_distinct, dup_ratio, is_trap): per-host content
    duplication profile — the crawl-trap / mirror-site detector that
    complements :func:`~amanogawa_spark.functions.url.url_templates`
    (template induction finds URL-SHAPE blowups; this finds hosts whose
    many URLs serve few distinct documents: session-id mirrors, calendar
    pages, soft-404 templates, print-view duplicates).

    ``dup_ratio = 1 - n_distinct/n_urls`` over md5 fingerprints of
    whitespace-normalized text; ``is_trap`` flags hosts with at least
    ``min_urls`` URLs and ``dup_ratio >= dup_ratio_threshold``. A crawl
    scheduler demotes flagged hosts; a curation pass drops them.

    Spark shape: one (host, fingerprint) distinct (map-side combined)
    feeding one per-host aggregate, plus one per-host URL count — no
    joins against the corpus, no text reshuffle (only 16-byte
    fingerprints move). Exact counts, so the DuckDB oracle matches
    bit-for-bit.
    """
    from amanogawa_spark.functions.url import host_of

    keyed = df.select(
        host_of(F.col(url_col)).alias("host"),
        F.md5(normalized_text(F.col(text_col))).alias("fp"),
    )
    urls = keyed.groupBy("host").agg(F.count(F.lit(1)).alias("n_urls"))
    dfp = (
        keyed.distinct()
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        urls.join(dfp, "host")
        .withColumn(
            "dup_ratio",
            F.round(1.0 - F.col("n_distinct") / F.col("n_urls"), 6),
        )
        .withColumn(
            "is_trap",
            (F.col("n_urls") >= min_urls)
            & (F.col("dup_ratio") >= dup_ratio_threshold),
        )
    )


def canonical_dedup(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, canonical_url, keep): dedup by the site-declared
    ``<link rel="canonical">`` signal — the zero-similarity-computation
    dedup pass that runs BEFORE MinHash/SimHash (print views, session-id
    mirrors, and tracking-parameter variants all declare the same
    canonical, so they collapse exactly with no shingling).

    ``canonical_url``: the page's declared canonical (itself when none
    declared — spec default). ``keep``: True iff the row is its group's
    representative — the canonical target itself when that URL is in the
    corpus, else the lexicographically smallest member (the canonical may
    not have been crawled). Single-hop resolution (spec-compliant pages
    point directly at the canonical; chains are a site bug).

    Spark shape: the extraction is a scan-side Arrow map; grouping is one
    distinct + one aggregate + two joins on ``canonical_url`` — HTML
    bytes never shuffle, only (url, canonical_url) string pairs.
    """
    from amanogawa_spark.functions.html import extract_canonical

    c = pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(extract_canonical(F.col(html_col)), F.col(url_col)).alias(
            "canonical_url"
        ),
    )
    present = (
        c.select(F.col("url").alias("canonical_url"))
        .distinct()
        .withColumn("_in", F.lit(True))
    )
    g = c.join(present, "canonical_url", "left")
    rep = g.groupBy("canonical_url").agg(
        F.min("url").alias("_minu"),
        F.max(F.coalesce(F.col("_in"), F.lit(False))).alias("_has"),
    )
    return (
        g.join(rep, "canonical_url")
        .withColumn(
            "keep",
            F.when(F.col("_has"), F.col("url") == F.col("canonical_url")).otherwise(
                F.col("url") == F.col("_minu")
            ),
        )
        .select("url", "canonical_url", "keep")
    )


def sig_agreement(a: Column, b: Column, num_hashes: int) -> Column:
    """Unbiased Jaccard estimate from two minhash signatures: the fraction
    of agreeing components (E[1{h_min(A)=h_min(B)}] = J(A,B) per
    permutation). Lets a dedup STORE keep only signatures — the verify
    step never needs the previous crawl's text."""
    return (
        F.aggregate(
            F.zip_with(a, b, lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(num_hashes))
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    store: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against a fingerprint store from previous crawls.

    ``store``: single-column (fp) table of previously-kept fingerprints
    (None = bootstrap). Returns ``(kept, new_store)``: kept = new rows
    whose fingerprint is unseen AND that are the min-id representative of
    their within-batch group; new_store = store ∪ kept fingerprints. The
    batch never joins against old TEXT — only against the O(corpus)
    fingerprint column — and old×old pairs are never revisited, so per
    recrawl the work is O(batch + store-probe), not O(corpus²).

    hash='md5' makes the fingerprint engine-portable (oracle mode);
    'xxhash64' keeps the two-seed 128-bit production fingerprint of
    :func:`exact_duplicates`.
    """
    norm = normalized_text(text_col)
    if hash == "md5":
        fp = F.md5(F.encode(norm, "UTF-8"))
    else:
        fp = F.concat_ws(
            ":",
            F.xxhash64(F.lit(1), norm).cast("string"),
            F.xxhash64(F.lit(2), norm).cast("string"),
        )
    keyed = new_df.withColumn("_fp", fp)
    if store is not None:
        s = store.select(F.col(store.columns[0]).alias("_fp"))
        fresh = keyed.join(s, "_fp", "left_anti")
    else:
        fresh = keyed
    w_min = fresh.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    kept = fresh.join(w_min, ["_fp", id_col], "left_semi")
    new_store = kept.select(F.col("_fp").alias("fp")).distinct()
    if store is not None:
        new_store = (
            store.select(F.col(store.columns[0]).alias("fp"))
            .unionByName(new_store)
            .distinct()
        )
    return kept.drop("_fp"), new_store


def incremental_minhash_dedup(
    new_df: DataFrame,
    store: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    hash: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup dedup of a NEW batch against a minhash-signature store.

    ``store``: (id, sig) of previously-kept documents (None = bootstrap).
    A new document is dropped when its estimated Jaccard
    (:func:`sig_agreement` — the store carries no text) reaches
    ``threshold`` against ANY store document sharing a band bucket, or
    when it is the higher id of a qualifying within-batch pair (the same
    drop-the-higher-id contract as :func:`minhash_dedup`). Returns
    ``(kept, new_store)`` with new_store = store ∪ kept signatures.

    Scale shape: the store is banded from SIGNATURES (text never
    re-read, never reshuffled); candidate generation is new×store and
    new×new bucket joins — old×old is structurally impossible — and
    ``max_bucket_size`` bounds hot buckets on both sides.
    """
    sig_new = minhash_signature_table(
        new_df, id_col, text_col, num_hashes, shingle_n, hash
    )
    sig_new = sig_new.persist()
    banded_new = banded_signatures(sig_new, num_hashes, bands, hash)
    if max_bucket_size is not None:
        ok = (
            banded_new.groupBy("band", "bucket")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded_new = banded_new.join(ok, ["band", "bucket"], "left_semi")

    dropped_vs_store = None
    if store is not None:
        banded_store = banded_signatures(
            store.select(F.col(store.columns[0]).alias("id"), F.col(store.columns[1]).alias("sig")),
            num_hashes,
            bands,
            hash,
        )
        if max_bucket_size is not None:
            ok_s = (
                banded_store.groupBy("band", "bucket")
                .agg(F.count("*").alias("_sz"))
                .filter(F.col("_sz") <= max_bucket_size)
                .select("band", "bucket")
            )
            banded_store = banded_store.join(ok_s, ["band", "bucket"], "left_semi")
        cand_ns = (
            banded_new.select(F.col("id").alias("id_new"), "band", "bucket")
            .join(
                banded_store.select(F.col("id").alias("id_old"), "band", "bucket"),
                ["band", "bucket"],
            )
            .select("id_new", "id_old")
            .distinct()
        )
        est_ns = (
            cand_ns.join(
                sig_new.select(F.col("id").alias("id_new"), F.col("sig").alias("sig_n")),
                "id_new",
            )
            .join(
                store.select(
                    F.col(store.columns[0]).alias("id_old"),
                    F.col(store.columns[1]).alias("sig_o"),
                ),
                "id_old",
            )
            .withColumn("est", sig_agreement(F.col("sig_n"), F.col("sig_o"), num_hashes))
        )
        dropped_vs_store = (
            est_ns.filter(F.col("est") >= threshold).select(F.col("id_new").alias("id")).distinct()
        )

    # within-batch: bucket self-join among new docs, estimator verify,
    # drop the higher id of each qualifying pair
    a = banded_new.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded_new.select(F.col("id").alias("id_b"), "band", "bucket")
    cand_nn = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    est_nn = (
        cand_nn.join(
            sig_new.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
        )
        .join(sig_new.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn("est", sig_agreement(F.col("sig_a"), F.col("sig_b"), num_hashes))
    )
    dropped_nn = (
        est_nn.filter(F.col("est") >= threshold).select(F.col("id_b").alias("id")).distinct()
    )
    dropped = dropped_nn if dropped_vs_store is None else dropped_nn.unionByName(dropped_vs_store).distinct()

    kept = new_df.join(dropped.select(F.col("id").alias(id_col)), id_col, "left_anti")
    kept_sigs = sig_new.join(dropped, "id", "left_anti").select("id", "sig")
    if store is not None:
        new_store = (
            store.select(
                F.col(store.columns[0]).alias("id"), F.col(store.columns[1]).alias("sig")
            )
            .unionByName(kept_sigs)
        )
    else:
        new_store = kept_sigs
    return kept, new_store


def mirror_hosts(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_shared: int = 3,
    containment_threshold: float = 0.5,
    max_hosts_per_fp: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """(host_a, host_b, n_shared, n_a, n_b, jaccard_r, containment_r) —
    cross-host mirror detection by content-fingerprint overlap.

    :func:`host_dup_profile` finds hosts duplicating WITHIN themselves;
    this finds host PAIRS serving the same documents — full mirrors,
    CDN/apex aliases the redirect resolver never saw, scraper sites.
    Mirrors matter upstream of everything: they double-count PageRank
    mass, inflate dedup clusters, and waste crawl budget.
    ``containment = shared / min(|A|, |B|)`` is the mirror signal (a
    small full mirror of a big site has low Jaccard but containment 1);
    pairs need ``min_shared`` common fingerprints AND containment ≥
    threshold. Jaccard is reported alongside to separate full mirrors
    (≈1) from subset scrapes.

    Scale shape: only (host, 16-byte fp) pairs ever shuffle; candidate
    generation is an fp-keyed self-join guarded by ``max_hosts_per_fp``
    — a fingerprint served by f hosts contributes f² pairs, so boiler-
    plate/empty-page fingerprints (the hot keys) are dropped before the
    join, bounding it at max_hosts_per_fp²·n_fps. Hosts sharing ONLY
    hot fingerprints are not mirrors in any useful sense.
    """
    from amanogawa_spark.functions.url import host_of

    keyed = df.select(
        host_of(F.col(url_col)).alias("host"),
        F.md5(normalized_text(F.col(text_col))).alias("fp"),
    ).distinct()
    sizes = keyed.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    ok_fp = (
        keyed.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_h"))
        .filter((F.col("_h") >= 2) & (F.col("_h") <= max_hosts_per_fp))
        .select("fp")
    )
    guarded = keyed.join(ok_fp, "fp", "left_semi")
    pairs = (
        guarded.select(F.col("host").alias("host_a"), "fp")
        .join(guarded.select(F.col("host").alias("host_b"), "fp"), "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        pairs.join(sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a")), "host_a")
        .join(sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b")), "host_b")
        .withColumn(
            "containment_r",
            F.round(F.col("n_shared") / F.least("n_a", "n_b"), round_to),
        )
        .withColumn(
            "jaccard_r",
            F.round(
                F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                round_to,
            ),
        )
        .filter(
            (F.col("n_shared") >= min_shared)
            & (F.col("containment_r") >= containment_threshold)
        )
    )
    return out.select(
        "host_a", "host_b", "n_shared", "n_a", "n_b", "jaccard_r", "containment_r"
    )

def lsh_plan(
    spark,
    num_hashes: int = 64,
    threshold: float = 0.8,
    grid: int = 20,
) -> DataFrame:
    """S-curve error analysis for every (bands, rows_per_band) split of
    ``num_hashes`` — the planning table behind choosing LSH banding.

    For each divisor pair the detection probability at similarity s is
    p(s) = 1 − (1 − s^r)^b.  Columns:

    - ``threshold_est`` = (1/b)^(1/r), the curve's inflection point;
    - ``p_at_threshold`` — recall exactly at the target threshold;
    - ``fp_mass`` / ``fn_mass`` — Σ p(s)·Δs below the threshold /
      Σ (1−p(s))·Δs at-or-above it over a uniform s grid (midpoint
      rule, ``grid`` cells): the candidate-verification waste and the
      missed-duplicate mass under a flat similarity prior;
    - ``total_err`` — their sum; the argmin row is the banding
      :func:`minhash_dedup` should run with.

    Pure generated-table expressions (range + sequence), no data scan —
    the same maths any engine reproduces, so the table is value-oracled.
    """
    b = F.col("bands").cast("double")
    r = F.col("rows_per_band").cast("double")
    divs = (
        spark.range(1, num_hashes + 1)
        .withColumnRenamed("id", "bands")
        .filter(F.lit(num_hashes) % F.col("bands") == 0)
        .withColumn(
            "rows_per_band", (F.lit(num_hashes) / F.col("bands")).cast("long")
        )
    )
    cells = divs.select(
        "bands",
        "rows_per_band",
        F.explode(F.sequence(F.lit(1), F.lit(grid))).alias("cell"),
    ).withColumn("s", (F.col("cell") - 0.5) / grid)
    p = 1.0 - F.pow(1.0 - F.pow(F.col("s"), r), b)
    agg = cells.groupBy("bands", "rows_per_band").agg(
        F.round(
            F.sum(F.when(F.col("s") < threshold, p).otherwise(0.0)) / grid, 8
        ).alias("fp_mass"),
        F.round(
            F.sum(F.when(F.col("s") >= threshold, 1.0 - p).otherwise(0.0))
            / grid,
            8,
        ).alias("fn_mass"),
    )
    return agg.select(
        "bands",
        "rows_per_band",
        F.round(F.pow(1.0 / b, 1.0 / r), 8).alias("threshold_est"),
        F.round(
            1.0 - F.pow(1.0 - F.pow(F.lit(float(threshold)), r), b), 8
        ).alias("p_at_threshold"),
        "fp_mass",
        "fn_mass",
        F.round(F.col("fp_mass") + F.col("fn_mass"), 8).alias("total_err"),
    )


def pick_bands(
    num_hashes: int = 64,
    threshold: float = 0.8,
    grid: int = 20,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> int:
    """Driver-side mirror of :func:`lsh_plan`'s argmin — the bands value
    minimizing ``fp_weight·fp_mass + fn_weight·fn_mass`` at the target
    threshold (ties: fewer bands, i.e. cheaper banding).  Equal weights
    are the usual convention; raise ``fn_weight`` when missing a
    duplicate costs more than verifying a spurious candidate (it
    usually does in corpus dedup — verification is one Jaccard).
    Pure python: call it to parameterize :func:`minhash_dedup` without
    a Spark job."""
    best = None
    for bands in range(1, num_hashes + 1):
        if num_hashes % bands:
            continue
        r = num_hashes // bands
        fp = fn = 0.0
        for cell in range(1, grid + 1):
            s = (cell - 0.5) / grid
            p = 1.0 - (1.0 - s**r) ** bands
            if s < threshold:
                fp += p / grid
            else:
                fn += (1.0 - p) / grid
        key = (fp_weight * fp + fn_weight * fn, bands)
        if best is None or key < best[0]:
            best = (key, bands)
    return best[1]

def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    hash: str = "md5",
) -> DataFrame:
    """(doc_id, pos, fp) — winnowing document fingerprints (Schleimer/
    Wilkerson/Aiken, MOSS): hash every k-gram, slide a window of ``w``
    consecutive hashes, keep each window's minimum (ties → rightmost —
    robust winnowing), then dedupe the selections.

    Guarantee: every substring match of length ≥ w + k − 1 between two
    documents shares at least one selected fingerprint — the bounded-
    density fingerprinting used for plagiarism/quote detection, a
    different tradeoff from MinHash (positional, locality-guaranteed)
    and CDC (whole-chunk equality).

    Spark shape: k-gram hashing and window minima are array expressions
    inside whole-stage codegen (O(n·w) comparisons per doc, zero
    exchanges); only the selected ~n/w fingerprints leave the map stage.
    hash='md5' is the engine-portable oracle mode, 'xxhash64' the cheap
    production mode.
    """
    n = F.length(F.col(text_col))
    if hash == "md5":
        def _h(gram):
            return F.conv(
                F.substring(F.md5(F.encode(gram, "UTF-8")), 1, 8), 16, 10
            ).cast("long")
    elif hash == "xxhash64":
        def _h(gram):
            return F.pmod(F.xxhash64(gram), F.lit(2**31))
    else:
        raise ValueError(f"hash must be 'md5' or 'xxhash64', got {hash!r}")
    # per-position k-gram hashes: positions 1..n-k+1
    hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1).cast("long"), (n - k + 1).cast("long")),
            lambda p: F.struct(
                _h(F.substring(F.col(text_col), p.cast("int"), k)).alias("h"),
                (-p).alias("negp"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<h:long,negp:long>>"))
    # window minima: for each start s, min struct (h asc, negp asc = pos desc)
    n_h = F.size(hashes)
    sel = F.when(
        n_h >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_h - w + 1),
                lambda s: F.array_min(F.slice(hashes, s, w)),
            )
        ),
    ).otherwise(
        F.when(n_h > 0, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<struct<h:long,negp:long>>")
        )
    )
    ex = df.select(F.col(id_col), F.explode(sel).alias("m"))
    return ex.select(
        id_col,
        (-F.col("m.negp")).cast("long").alias("pos"),
        F.col("m.h").alias("fp"),
    )


def winnow_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_fp: int = 64,
    hash: str = "md5",
) -> DataFrame:
    """(id_a, id_b, shared) — document pairs sharing ≥ ``min_shared``
    winnowed fingerprints (id_a < id_b): the quote/plagiarism candidate
    generator.  Same hot-key contract as the minhash/mirror paths:
    fingerprints present in more than ``max_docs_per_fp`` documents
    (boilerplate) are dropped before the fp-keyed self-join."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w, hash).select(
        F.col(id_col).alias("id"), "fp"
    ).distinct()
    counts = fps.groupBy("fp").agg(F.count("*").alias("nd"))
    keep = counts.filter(
        (F.col("nd") >= 2) & (F.col("nd") <= max_docs_per_fp)
    ).select("fp")
    fps = fps.join(keep, "fp", "left_semi")
    a = fps.select("fp", F.col("id").alias("id_a"))
    b = fps.select("fp", F.col("id").alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def hamming_neardup(
    hashes: DataFrame,
    id_col: str = "id",
    hash_col: str = "sh",
    n_bits: int = 64,
    bands: int = 4,
    max_distance: int = 3,
    max_band_size: int | None = None,
) -> DataFrame:
    """(a, b, distance) — all id pairs whose fingerprints differ in at
    most ``max_distance`` bits, WITHOUT the all-pairs join.

    The generic Hamming verifier behind every bit-fingerprint near-dup
    family: text SimHash (:func:`simhash_table`), image dHash
    (``operators/multimodal.media_dhashes``), winnowing digests. Split
    the ``n_bits`` fingerprint into ``bands`` equal bit-ranges; by
    pigeonhole, two hashes within ``max_distance < bands`` bit flips
    agree EXACTLY on at least one band — so the band-value self-join is
    a lossless candidate generator, and one ``bit_count(xor)`` per
    candidate verifies the true distance. Requires
    ``max_distance < bands`` (raises otherwise: recall would silently
    drop below 1).

    Scale: the self-join is per-(band, value) bucket — the LSH-banding
    shape; ``max_band_size`` drops degenerate hot bands (e.g. the
    all-zeros band of near-empty inputs) exactly like
    ``minhash_dedup``'s ``max_bucket_size`` hot-bucket guard.
    """
    if max_distance >= bands:
        raise ValueError(
            f"hamming_neardup: need max_distance < bands for exact recall "
            f"(got distance {max_distance}, bands {bands})"
        )
    band_bits = (n_bits + bands - 1) // bands
    mask = (1 << band_bits) - 1
    h = hashes.select(
        F.col(id_col).alias("id"), F.col(hash_col).cast("long").alias("h")
    )
    bb = h.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # logical shift: fingerprints may carry bit 63
                        # (two's-complement-folded unsigned hashes)
                        F.shiftrightunsigned("h", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_value"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "h", "bb.band", "bb.band_value")
    if max_band_size is not None:
        ok = (
            bb.groupBy("band", "band_value")
            .agg(F.count("*").alias("nb"))
            .filter(F.col("nb") <= max_band_size)
            .select("band", "band_value")
        )
        bb = bb.join(ok, ["band", "band_value"], "left_semi")
    x = bb.select("band", "band_value", F.col("id").alias("a"), F.col("h").alias("ha"))
    y = bb.select("band", "band_value", F.col("id").alias("b"), F.col("h").alias("hb"))
    cand = (
        x.join(y, ["band", "band_value"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "a",
        "b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long").alias("distance"),
    ).filter(F.col("distance") <= max_distance)


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_count: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """Corpus-wide exact line-level dedup (the C4/Dolma line-dedup step):
    every line whose (normalized) form occurs >= ``min_count`` times across
    the WHOLE corpus is removed from every document except its first
    occurrence — the smallest ``(id, line_no)`` — and each document's text
    is reassembled from its surviving lines.

    Returns ``(id, clean_text, n_lines, n_removed)`` — one row per input
    document (documents that lose every line come back with
    ``clean_text=''``).

    Complements :func:`remove_duplicated_spans` (token n-gram spans): the
    unit here is a whole delimiter-bounded line, the keep-first contract
    preserves one canonical occurrence corpus-wide (span removal cuts ALL
    occurrences), and boilerplate lines (nav bars, cookie banners) are the
    target. The reference engine has no dedup beyond `to_graph`'s edge
    dedup (to_graph.cpp:82-86); this is the training-data-pipeline
    extension demanded at 100 TB.

    Scale: two shuffles — one hash aggregate keyed on a 128-bit line
    fingerprint (same two-halves construction as :func:`exact_duplicates`;
    the grouping key is the hash, never the line bytes, so hub lines cost
    16 bytes of key), and one reassembly aggregate keyed on ``id``. The
    first-occurrence argmin rides the line aggregate as a min-struct, so
    no window over the corpus and no driver collect anywhere.

    ``delimiter`` is treated as a LITERAL separator on both the split and
    the reassembly side (it is regex-escaped before reaching ``F.split``,
    which would otherwise interpret it as a Java regex while
    ``F.array_join`` treats it literally — a metachar delimiter like
    ``'|'`` would split per character and reassemble different text).
    NULL ``text_col`` values are coalesced to ``''`` so such documents
    still produce their contracted one output row (``F.split(NULL)``
    yields NULL and ``posexplode`` would silently drop the document).
    """
    import re as _re

    line_raw = F.col("__line")
    line_key = normalized_text(line_raw) if normalize else line_raw
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(_re.escape(delimiter)),
                -1,
            )
        ).alias("line_no", "__line"),
    ).select(
        "id",
        "line_no",
        line_raw.alias("line"),
        F.struct(
            F.xxhash64(F.lit(1), line_key).alias("h1"),
            F.xxhash64(F.lit(2), line_key).alias("h2"),
        ).alias("lk"),
    )
    occ = lines.groupBy("lk").agg(
        F.min(F.struct("id", "line_no")).alias("first_occ"),
        F.count("*").alias("cnt"),
    )
    kept = (
        lines.join(occ, "lk")
        .filter(
            (F.col("cnt") < F.lit(min_count))
            | (
                (F.col("first_occ.id") == F.col("id"))
                & (F.col("first_occ.line_no") == F.col("line_no"))
            )
        )
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s["line"],
                ),
                delimiter,
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
    return totals.join(kept, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )
