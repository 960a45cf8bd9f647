"""Product quantization: compressed embeddings + ADC top-k search.

The memory story for ANN at 100 TB: a 64-dim float32 embedding is 256
bytes; its PQ code at m=8 subspaces × 4 bits is 4 bytes — a 64×
compression that turns a cluster-wide shuffle-heavy vector scan into a
byte-sized column Catalyst streams through whole-stage codegen. This is
the standard IVF-PQ pairing: :func:`amanogawa_spark.operators.similarity.ivf_topk`
routes queries to centroid lists; PQ-ADC scores the candidates without
ever decoding a vector.

All stages are built-in expressions — no UDFs anywhere:

- **train** (:func:`pq_train`): per-subspace Lloyd's k-means run JOINTLY
  (one pass per iteration for all m subspaces): assignment is a pure
  projection against codebook LITERALS (no join, no shuffle), the
  update is ONE map-side-combined aggregate of (sub, code, pos) partial
  sums. Deterministic hash-smallest init, lowest-code tie-breaks.
- **encode** (:func:`pq_encode`): zero-shuffle map — m argmins over k
  literal centroids each. Keep k ≤ 64 on this literal path (m·k
  distance expressions per row compile into the generated code; for
  k = 256 codebooks switch to a broadcast-join assignment).
- **search** (:func:`pq_adc_topk`): asymmetric distance computation —
  the query→codebook lookup table (q × m × k doubles) is computed
  driver-side with SEQUENTIAL Python float arithmetic (IEEE-identical
  to the SQL oracle's fold) and shipped as one literal 3D array;
  per-row score is m chained lookups + adds, then the bounded top-k
  window. The corpus side touches only (id, codes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Codebooks = "list[list[list[float]]]"  # [sub][code][dim_sub]


def _sq_dist_lit(vec: Column, c: list[float]) -> Column:
    """||vec − c||² against a literal centroid — left-fold order."""
    lit_c = F.array(*[F.lit(float(x)) for x in c])
    return F.aggregate(
        F.zip_with(vec, lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sub(vec: Column, s: int, d_sub: int) -> Column:
    return F.slice(vec, s * d_sub + 1, d_sub)


def _assign_code(subvec: Column, cents: list[list[float]]) -> Column:
    """argmin over codebook entries; ties → lowest code."""
    arr = F.array(*[_sq_dist_lit(subvec, c) for c in cents])
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    max_iter: int = 8,
    tol: float = 1e-6,
    seed: int = 0,
) -> list:
    """Train m per-subspace codebooks of k centroids each (Lloyd's).

    Returns ``codebooks[sub][code] -> list[d_sub floats]``. One Spark
    pass per iteration: codes via literal argmins (map-only), then ONE
    aggregate of (sub, code, pos, Σval, n). Empty codes keep their
    previous centroid. Deterministic init (the k hash-smallest ids'
    subvectors) and deterministic tie-breaks; the centroid means
    accumulate partial sums in shuffle order, so trained books are
    repartition-invariant up to float-sum associativity (~1e-12 per
    mean), not bitwise — the same contract as ``kmeans_centroids``.
    Oracle-checked paths therefore use FIXED codebooks (see q_pq_adc).
    """
    dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    vec_d = F.col(vec_col).cast("array<double>")

    init_rows = (
        df.select(F.col(id_col).alias("id"), vec_d.alias("v"))
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)).asc(), F.col("id").asc())
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init_rows)}")
    books = [
        [list(init_rows[c]["v"][s * d_sub : (s + 1) * d_sub]) for c in range(k)]
        for s in range(m)
    ]

    for _ in range(max_iter):
        structs = [
            F.struct(
                F.lit(s).alias("sub"),
                _assign_code(_sub(vec_d, s, d_sub), books[s]).alias("cid"),
                _sub(vec_d, s, d_sub).alias("sv"),
            )
            for s in range(m)
        ]
        upd = (
            df.select(F.explode(F.array(*structs)).alias("e"))
            .select("e.sub", "e.cid", F.posexplode("e.sv").alias("pos", "val"))
            .groupBy("sub", "cid", "pos")
            .agg(F.sum("val").alias("tot"), F.count("*").alias("n"))
            .collect()
        )
        sums: dict[tuple[int, int], list] = {}
        for r in upd:
            cell = sums.setdefault((r["sub"], r["cid"]), [[0.0] * d_sub, 0])
            cell[0][r["pos"]] = r["tot"]
            cell[1] = r["n"]
        shift = 0.0
        new_books = []
        for s in range(m):
            row = []
            for c in range(k):
                if (s, c) in sums:
                    tot, n = sums[(s, c)]
                    mean = [t / n for t in tot]
                else:
                    mean = books[s][c]  # empty code keeps its centroid
                shift = max(
                    shift,
                    sum((a - b) ** 2 for a, b in zip(mean, books[s][c])) ** 0.5,
                )
                row.append(mean)
            new_books.append(row)
        books = new_books
        if shift <= tol:
            break
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — zero-shuffle literal-argmin assignment."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    vec_d = F.col(vec_col).cast("array<double>")
    codes = F.array(
        *[_assign_code(_sub(vec_d, s, d_sub), codebooks[s]) for s in range(m)]
    )
    return df.select(F.col(id_col).alias("id"), codes.alias("codes"))


def pq_decode_expr(codes: Column, codebooks: list) -> Column:
    """codes → reconstructed array<double> (codebook literal lookup)."""
    parts = []
    for s, book in enumerate(codebooks):
        book_lit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
        parts.append(F.element_at(book_lit, F.element_at(codes, s + 1) + 1))
    return F.flatten(F.array(*parts))


def _seq_sq_dist(a: list[float], b: list[float]) -> float:
    """Sequential-fold ||a−b||² — IEEE-identical to the SQL oracle's fold."""
    d = 0.0
    for x, y in zip(a, b):
        t = x - y
        d += t * t
    return d


def _lut_literal(queries: list[tuple[int, list[float]]], codebooks: list) -> Column:
    """lut[q][sub][code] = ||q_sub − c||² as ONE literal 3D array (driver-side
    sequential float arithmetic, shipped once per plan)."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut = []
    for _, qv in queries:
        per_sub = []
        for s in range(m):
            per_sub.append(
                [_seq_sq_dist(qv[s * d_sub : (s + 1) * d_sub], c) for c in codebooks[s]]
            )
        lut.append(per_sub)
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(v) for v in row]) for row in per_sub])
            for per_sub in lut
        ]
    )


def pq_adc_topk(
    encoded: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list,
    k: int = 5,
) -> DataFrame:
    """(query_id, id, adist, rn) — ADC top-k per query over PQ codes.

    The query LUT (``lut[q][sub][code] = ||q_sub − c||²``) is computed
    driver-side with sequential float arithmetic and shipped as ONE
    literal 3D array; scoring is m chained element_at lookups + adds
    (left-to-right, so the engine-portable oracle can mirror the exact
    fp order). Queries ride in a broadcast; losers never leave the
    per-partition bounded sort.
    """
    m = len(codebooks)
    lut_lit = _lut_literal(queries, codebooks)
    spark = encoded.sparkSession
    qdf = spark.createDataFrame(
        [(int(qid), i) for i, (qid, _) in enumerate(queries)],
        "query_id long, qidx int",
    )
    joined = encoded.crossJoin(F.broadcast(qdf))
    dist = F.lit(0.0)
    for s in range(m):
        dist = dist + F.element_at(
            F.element_at(F.element_at(lut_lit, F.col("qidx") + 1), s + 1),
            F.element_at("codes", s + 1) + 1,
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("id").asc()
    )
    return (
        joined.withColumn("adist", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "id", "adist", "rn")
    )


def ivf_pq_topk(
    encoded_src: DataFrame,
    codebooks: list,
    queries: list[tuple[int, list[float]]],
    coarse: list[tuple[int, list[float]]],
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC: coarse inverted lists route queries, PQ-ADC scores candidates.

    The full FAISS-style pairing: each corpus vector lands in the inverted
    list of its nearest coarse centroid (squared-L2, ties → lower cid) and
    is stored only as its PQ code; a query probes its ``nprobe`` nearest
    lists and ADC-scores just those members — per-query work drops from
    O(n) to O(n·nprobe/C) versus :func:`pq_adc_topk`, with no vector ever
    decoded. This variant quantizes RAW vectors (IVFADC-flat); residual
    quantization changes what the codebooks are trained on, not the plan.

    ``coarse`` is the driver-side centroid table [(cid, vec)] — tiny by
    design (it is shipped as literals for the assignment expressions and
    used to build the probe routing). 100 TB shape: corpus-side
    assignment+encode is ONE zero-shuffle map (literal argmins, no join);
    the probe table (|queries|·nprobe rows) broadcasts into the list join,
    so the only movement of corpus data is the final bounded top-k window
    over probed-list members.
    """
    coarse = sorted(coarse, key=lambda t: t[0])
    cids = [int(cid) for cid, _ in coarse]
    m = len(codebooks)
    d_sub = len(codebooks[0][0])

    vec_d = F.col(vec_col).cast("array<double>")
    cdists = F.array(*[_sq_dist_lit(vec_d, cv) for _, cv in coarse])
    cid_lit = F.array(*[F.lit(c) for c in cids])
    # argmin over the coarse table: array_position finds the FIRST minimum,
    # and coarse is cid-sorted, so ties break toward the lower cid
    cid_col = F.element_at(cid_lit, F.array_position(cdists, F.array_min(cdists)).cast("int"))
    codes = F.array(
        *[_assign_code(_sub(vec_d, s, d_sub), codebooks[s]) for s in range(m)]
    )
    enc = encoded_src.select(
        F.col(id_col).alias("id"), codes.alias("codes"), cid_col.alias("cid")
    )

    # driver-side probe routing: same sequential fold as the LUT
    probe_rows = []
    for qidx, (qid, qv) in enumerate(queries):
        ranked = sorted(
            ((_seq_sq_dist(qv, cv), cid) for cid, cv in coarse),
            key=lambda t: (t[0], t[1]),
        )
        for d, cid in ranked[:nprobe]:
            probe_rows.append((int(qid), qidx, int(cid)))
    spark = encoded_src.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, qidx int, cid int")

    lut_lit = _lut_literal(queries, codebooks)
    joined = enc.join(F.broadcast(probes), "cid")
    dist = F.lit(0.0)
    for s in range(m):
        dist = dist + F.element_at(
            F.element_at(F.element_at(lut_lit, F.col("qidx") + 1), s + 1),
            F.element_at("codes", s + 1) + 1,
        )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("id").asc())
    return (
        joined.withColumn("adist", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "id", "adist", "rn")
    )
