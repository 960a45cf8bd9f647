"""TOML job-spec loader — the reference's primary authoring surface.

The reference is driven by ``./amanogawa-cli config.toml`` (``src/amanogawa/
cli.cpp:5-9``) or the fluent ``ConfigBuilder`` (``include/config_builder.h:
12-328``); both produce a component graph in five classes (source / flow /
branch / confluence / sink, ``include/common.h:7-11``, ``include/config.h:
17-55``) wired by ``from``/``to`` name references. This module maps that
exact TOML surface onto :class:`~amanogawa_spark.plans.pipeline.Pipeline`,
so a reference user's config file runs unchanged (modulo paths) on Spark.

Supported component types (reference parity; ``example/*.toml``):

- ``[source.<name>] type="file"`` with ``[.format] type="csv"|"json"``
  (declared ``columns``, ``delimiter``, ``skip_header``, ``skip_columns``,
  ``data_type``), or ``type="xml"`` with ``format.columns``; or
  ``type="rmat"`` (``scale``, ``edge_factor``, ``a/b/c``, ``seed`` — the
  zero-input synthetic edge source for scale rehearsals).
- ``[flow.<name>] type="filter"|"filter_row"`` (optional ``column/op/cond``
  predicate — the reference's filter is a parameterless stub, so a bare
  filter is identity), ``type="filter_column"`` (``columns`` projection),
  ``type="to_graph"`` (``mode`` bow|cosine, ``knn.k``, ``column``).
- ``[branch.<name>] type="column"`` with ``to=[{name, columns}]``; branch
  outputs are addressable by their bare ``to`` names, as in the reference.
- ``[confluence.<name>] type="key"`` with ``from=[{name, key}, {name,
  key}]`` (inner equi-join, right key dropped, left name wins — the
  reference's key join), or ``type="inner_join"|"outer_join"`` with
  ``join=[{name, key}, ...]``.
- ``[sink.<name>] type="file"`` with ``[.format] type="csv"`` (``delimiter``,
  ``columns`` subset, ``write_header``) | ``"json"`` | ``"parquet"``.

Anonymous single-component tables (``[source]`` / ``[flow]`` / ``[sink]``
as in ``example/simple.toml`` / ``simple_to_graph.toml``) are wired
linearly: source → flow → sink.

Engine-extension flow types beyond the reference surface (the curation
operators, declaratively reachable): ``type="sample"`` (``method=
"hash"|"stratified"``, ``p``/``n``+``group_column``, ``keys``),
``type="dedup"`` (``method="exact"|"minhash"``, ``id_column``,
``column``, ``threshold``), ``type="tfidf"`` (``id_column``, ``column``,
``tokenizer``, ``min_df``), ``type="quality"`` (``method=
"c4"|"repetition"|"redact"``, ``min_words``), ``type="pack"``
(``max_tokens``, ``tokens_column``, ``hash``, ``seed``),
``type="bpe_encode"`` (``merges``), ``type="semdedup"`` (``threshold``,
``stride``, ``max_cluster_size``), ``type="canonical_dedup"``
(``url_column``, ``html_column``, ``keep_only``), ``type="url_templates"``
(``url_column``, ``wildcard_min_distinct``, ``max_depth``,
``aggregate``), ``type="cdc_dedup"`` (``window``, ``modulus``,
``hash``, ``max_dup_frac`` — set to keep-filter instead of profiling),
``type="line_dedup"`` (corpus-wide keep-first line dedup: ``delimiter``,
``min_count``; text column replaced by the cleaned text),
``type="topics"`` (PLSA: ``k``, ``iterations``, ``dominant`` — emit the
per-doc argmax topic label instead of the full mixture),
``type="unigram_encode"`` (train + Viterbi-encode the unigram-LM
tokenizer: ``rounds``, ``vocab_size``, ``max_piece_len``, ``min_count``,
``max_word_len``).
Sink formats additionally accept ``cluster_by = ["col", ...]`` — a
similarity-ordered write layout (range-sort across ``coalesce`` files;
``operators/ordering.py``) so near-duplicate rows share row groups.

Relative paths resolve against the config file's directory (CLI parity).
Sinks write Spark-style part-file directories — at cluster scale that is
the correct distributed output shape; single-file concat is a driver-side
post-step users can opt into with ``coalesce=1`` in the sink format table.
"""

from __future__ import annotations

import os
import tomllib
from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amanogawa_spark.operators.etl import branch_columns, key_join, row_filter
from amanogawa_spark.plans.pipeline import Pipeline
from amanogawa_spark.sources.readers import read_csv, read_json, read_xml
from amanogawa_spark.sources.writers import write_csv, write_json, write_parquet


def _named_components(table: dict | None, clazz: str) -> list[tuple[str, dict]]:
    """A clazz table is either {name: spec} or one anonymous spec (detected
    by a string-valued 'type' key at the top level)."""
    if not table:
        return []
    if isinstance(table.get("type"), str):
        return [(clazz, table)]
    return [(name, spec) for name, spec in table.items()]


def _resolve_path(path: str, base_dir: str) -> str:
    return path if os.path.isabs(path) else os.path.join(base_dir, path)


def _source_fn(spec: dict, base_dir: str):
    fmt = dict(spec.get("format", {}))
    src_type = spec.get("type", "file")
    if src_type == "rmat":
        # zero-input synthetic edge source (graph/generate.py): scale
        # rehearsals without staging any parquet — (edge_id, src_id, dst_id)
        from amanogawa_spark.graph.generate import rmat_edges

        return lambda spark: rmat_edges(
            spark,
            scale=int(spec["scale"]),
            edge_factor=int(spec.get("edge_factor", 16)),
            a=float(spec.get("a", 0.57)),
            b=float(spec.get("b", 0.19)),
            c=float(spec.get("c", 0.19)),
            seed=int(spec.get("seed", 0)),
            num_partitions=(
                int(spec["partitions"]) if "partitions" in spec else None
            ),
        )
    fmt_type = fmt.get("type") or (src_type if src_type != "file" else None)
    path = _resolve_path(spec["path"], base_dir)
    if fmt_type is None:  # dispatch on suffix like the reference's format probe
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt_type = {"jsonl": "json"}.get(ext, ext or "csv")
    if fmt_type == "csv":
        return lambda spark: read_csv(
            spark,
            path,
            columns=fmt.get("columns") or None,
            delimiter=fmt.get("delimiter", ","),
            header=bool(fmt.get("skip_header", False)),
            data_type=fmt.get("data_type", "double"),
            skip_columns=fmt.get("skip_columns"),
            num_header_lines=fmt.get("num_header_lines"),
        )
    if fmt_type == "json":
        return lambda spark: read_json(
            spark,
            path,
            columns=fmt.get("columns") or None,
            jsonl=fmt.get("jsonl"),
            row_filter=fmt.get("filter"),
        )
    if fmt_type == "xml":
        return lambda spark: read_xml(
            spark, path, columns=fmt["columns"], row_tag=fmt.get("row_tag")
        )
    if fmt_type == "parquet":
        return lambda spark: spark.read.parquet(path)
    if fmt_type == "orc":
        return lambda spark: spark.read.orc(path)
    if fmt_type in ("warc", "warc.gz"):
        from amanogawa_spark.sources.warc import read_warc, warc_pages

        if fmt.get("pages", True):  # input_hint pages shape by default
            return lambda spark: warc_pages(spark, path)
        return lambda spark: read_warc(
            spark, path, record_types=tuple(fmt.get("record_types", ["response"]))
        )
    raise ValueError(f"unsupported source format: {fmt_type!r}")


def _with_row_ids(df: DataFrame, id_col: str = "_row_id") -> DataFrame:
    """Stable 0..N-1 ids in input row order — the reference's implicit
    to_graph vertex numbering (row index in file order). zipWithIndex
    preserves partition-then-offset order, which for a file scan IS file
    order. Config-surface convenience; scale pipelines supply real ids."""
    schema = df.schema
    rdd = df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    from pyspark.sql import types as T

    out_schema = T.StructType(list(schema.fields) + [T.StructField(id_col, T.LongType())])
    return df.sparkSession.createDataFrame(rdd, out_schema)


def _to_graph_fn(spec: dict):
    knn = spec.get("knn", {})
    k = int(knn.get("k", 3))
    # reference parity: knn.mode defaults "approx" (to_graph.cpp:34-36) —
    # the bucketed LSH path; "exact" opts into the O(n²) verify join
    knn_mode = knn.get("mode", "approx")
    mode = spec.get("mode", "cosine")
    column = spec.get("column")

    def fn(df: DataFrame) -> DataFrame:
        ids = _with_row_ids(df)
        if mode == "bow":
            from amanogawa_spark.operators.bow import bow_knn_graph

            return bow_knn_graph(
                ids, id_col="_row_id", text_col=column, k=k,
                tokenizer=spec.get("tokenizer", "whitespace"),
            )
        from amanogawa_spark.operators.similarity import knn_graph

        vec_cols = [column] if column else [
            f.name for f in df.schema.fields if f.dataType.typeName() in
            ("double", "float", "integer", "long")
        ]
        if len(vec_cols) == 1 and df.schema[vec_cols[0]].dataType.typeName() == "array":
            vecs = ids.select("_row_id", F.col(vec_cols[0]).alias("v"))
        else:
            vecs = ids.select(
                "_row_id", F.array(*[F.col(c).cast("double") for c in vec_cols]).alias("v")
            )
        return knn_graph(
            vecs,
            id_col="_row_id",
            vec_col="v",
            k=k,
            mode="exact" if knn_mode == "exact" else "approx",
        )

    return fn


def _flow_fn(spec: dict):
    t = spec["type"]
    if t in ("filter", "filter_row"):
        if all(key in spec for key in ("column", "op", "cond")):
            return lambda df: row_filter(df, spec["column"], spec["op"], spec["cond"])
        return lambda df: df  # the reference's filter is a stub — identity
    if t == "filter_column":
        cols = spec.get("columns")
        return (lambda df: df.select(*cols)) if cols else (lambda df: df)
    if t == "to_graph":
        return _to_graph_fn(spec)
    # --- engine extensions beyond the reference surface (curation ops) ---
    if t == "sample":
        from amanogawa_spark.operators.sampling import hash_sample, stratified_sample

        method = spec.get("method", "hash")
        keys = spec.get("keys") or [spec["key"]]
        if method == "stratified":
            return lambda df: stratified_sample(
                df, spec["group_column"], int(spec.get("n", 100)), keys,
                hash=spec.get("hash", "xxhash64"), seed=int(spec.get("seed", 7)),
            )
        return lambda df: hash_sample(
            df, float(spec.get("p", 0.01)), keys,
            hash=spec.get("hash", "xxhash64"), seed=int(spec.get("seed", 7)),
        )
    if t == "dedup":
        method = spec.get("method", "exact")
        id_col = spec.get("id_column", "doc_id")
        col = spec.get("column", "text")
        if method == "minhash":
            from amanogawa_spark.operators.dedup import minhash_dedup

            return lambda df: minhash_dedup(
                df, id_col=id_col, text_col=col,
                threshold=float(spec.get("threshold", 0.8)),
            )
        from amanogawa_spark.operators.dedup import dedup_exact

        return lambda df: dedup_exact(df, id_col=id_col, text_col=col)
    if t == "line_dedup":
        from amanogawa_spark.operators.dedup import line_dedup

        ld_id = spec.get("id_column", "doc_id")
        ld_col = spec.get("column", "text")
        ld_delim = spec.get("delimiter", "\n")
        ld_min = int(spec.get("min_count", 2))

        def _line_dedup(df):
            cleaned = line_dedup(
                df, id_col=ld_id, text_col=ld_col,
                delimiter=ld_delim, min_count=ld_min,
            )
            # Left join + coalesce: no document may vanish from the
            # pipeline even if it produced no line_dedup row (defense in
            # depth on top of line_dedup's one-row-per-document contract).
            return df.drop(ld_col).join(
                cleaned.select(ld_id, F.col("clean_text").alias(ld_col)),
                ld_id,
                "left",
            ).withColumn(ld_col, F.coalesce(F.col(ld_col), F.lit("")))

        return _line_dedup
    if t == "tfidf":
        from amanogawa_spark.operators.bow import tf_idf

        return lambda df: tf_idf(
            df, id_col=spec.get("id_column", "doc_id"),
            text_col=spec.get("column", "text"),
            tokenizer=spec.get("tokenizer", "whitespace"),
            min_df=int(spec.get("min_df", 1)),
        )
    if t == "quality":
        from amanogawa_spark.operators.quality import (
            c4_line_filter,
            redact_pii,
            repetition_features,
        )

        method = spec.get("method", "c4")
        id_col = spec.get("id_column", "doc_id")
        col = spec.get("column", "text")
        if method == "repetition":
            return lambda df: repetition_features(df, id_col=id_col, text_col=col)
        if method == "redact":
            return lambda df: redact_pii(df, id_col=id_col, text_col=col)
        return lambda df: c4_line_filter(
            df, id_col=id_col, text_col=col,
            min_words=int(spec.get("min_words", 3)),
        )
    if t == "pack":
        from amanogawa_spark.operators.packing import pack_sequences

        return lambda df: pack_sequences(
            df,
            max_tokens=int(spec.get("max_tokens", 2048)),
            id_col=spec.get("id_column", "doc_id"),
            tokens_col=spec.get("tokens_column", "n_tokens"),
            hash=spec.get("hash", "xxhash64"),
            seed=int(spec.get("seed", 7)),
        )
    if t == "bpe_encode":
        from amanogawa_spark.operators.bpe import bpe_encode

        merges = [tuple(m) for m in spec.get("merges", [])]
        return lambda df: bpe_encode(
            df, merges,
            id_col=spec.get("id_column", "doc_id"),
            text_col=spec.get("column", "text"),
        )
    if t == "semdedup":
        from amanogawa_spark.operators.semdedup import semdedup

        return lambda df: semdedup(
            df,
            id_col=spec.get("id_column", "vec_id"),
            vec_col=spec.get("column", "embedding"),
            threshold=float(spec.get("threshold", 0.9)),
            stride=int(spec.get("stride", 25)),
            max_cluster_size=(
                int(spec["max_cluster_size"]) if "max_cluster_size" in spec else None
            ),
        )
    if t == "canonical_dedup":
        from amanogawa_spark.operators.dedup import canonical_dedup

        keep_only = bool(spec.get("keep_only", False))

        def _canon(df):
            out = canonical_dedup(
                df,
                url_col=spec.get("url_column", "url"),
                html_col=spec.get("html_column", "html"),
            )
            return out.filter(F.col("keep")) if keep_only else out

        return _canon
    if t == "url_templates":
        from amanogawa_spark.functions.url import url_template_stats, url_templates

        fn = url_template_stats if spec.get("aggregate", True) else url_templates
        return lambda df: fn(
            df,
            url_col=spec.get("url_column", "url"),
            wildcard_min_distinct=int(spec.get("wildcard_min_distinct", 10)),
            max_depth=int(spec.get("max_depth", 8)),
        )
    if t == "cdc_dedup":
        from amanogawa_spark.operators.chunking import cdc_dup_stats

        def _cdc(df):
            out = cdc_dup_stats(
                df,
                id_col=spec.get("id_column", "doc_id"),
                text_col=spec.get("column", "text"),
                window=int(spec.get("window", 8)),
                modulus=int(spec.get("modulus", 64)),
                hash=spec.get("hash", "poly"),
            )
            max_dup = spec.get("max_dup_frac")
            if max_dup is not None:
                # keep-filter mode: join survivors back to full rows
                keep = out.filter(F.col("dup_frac") <= float(max_dup)).select(
                    spec.get("id_column", "doc_id")
                )
                return df.join(keep, spec.get("id_column", "doc_id"), "left_semi")
            return out
        return _cdc
    if t == "topics":
        from pyspark.sql import Window

        from amanogawa_spark.operators.topics import doc_term_counts, plsa

        id_col = spec.get("id_column", "doc_id")
        col = spec.get("column", "text")
        k = int(spec.get("k", 4))
        iterations = int(spec.get("iterations", 10))

        def _topics(df):
            th, _ = plsa(
                doc_term_counts(df, id_col=id_col, text_col=col),
                k=k,
                iterations=iterations,
            )
            if spec.get("dominant", False):
                w = Window.partitionBy("id").orderBy(F.desc("p"), F.asc("topic"))
                return (
                    th.withColumn("rn", F.row_number().over(w))
                    .filter("rn = 1")
                    .select(F.col("id").alias(id_col), "topic", "p")
                )
            return th

        return _topics
    if t == "unigram_encode":
        from amanogawa_spark.operators.unigram import unigram_encode, unigram_train

        id_col = spec.get("id_column", "doc_id")
        col = spec.get("column", "text")
        max_piece_len = int(spec.get("max_piece_len", 6))

        def _uni(df):
            probs = unigram_train(
                df,
                rounds=int(spec.get("rounds", 2)),
                vocab_size=(
                    int(spec["vocab_size"]) if "vocab_size" in spec else None
                ),
                max_piece_len=max_piece_len,
                min_count=int(spec.get("min_count", 2)),
                id_col=id_col,
                text_col=col,
            )
            return unigram_encode(
                df,
                probs,
                max_piece_len=max_piece_len,
                id_col=id_col,
                text_col=col,
                max_word_len=(
                    int(spec["max_word_len"]) if "max_word_len" in spec else None
                ),
            )

        return _uni
    raise ValueError(f"unsupported flow type: {t!r}")


def _sink_fn(spec: dict, base_dir: str):
    fmt = dict(spec.get("format", {}))
    path = _resolve_path(spec["path"], base_dir)
    fmt_type = fmt.get("type")
    if fmt_type is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt_type = {"tsv": "csv", "jsonl": "json", "": "parquet"}.get(ext, ext)
    coalesce = int(fmt.get("coalesce", 0))
    # similarity-ordered layout: cluster_by = ["host","sh",...] range-sorts
    # rows across `coalesce` (or default) output files so near-duplicates
    # share row groups (operators/ordering.py); replaces plain coalesce —
    # a post-sort coalesce would concatenate sorted runs out of order
    cluster_by = fmt.get("cluster_by") or None

    def prep(df: DataFrame) -> DataFrame:
        if cluster_by:
            from amanogawa_spark.operators.ordering import clustered

            return clustered(df, list(cluster_by), coalesce or None)
        return df.coalesce(coalesce) if coalesce else df

    if fmt_type == "csv":
        return lambda df: write_csv(
            prep(df),
            path,
            columns=fmt.get("columns") or None,  # [] means all (basic.toml)
            delimiter=fmt.get("delimiter", ","),
            write_header=bool(fmt.get("write_header", True)),
        )
    if fmt_type == "json":
        return lambda df: write_json(prep(df), path)
    if fmt_type == "parquet":
        return lambda df: write_parquet(prep(df), path)
    if fmt_type == "orc":
        return lambda df: prep(df).write.mode("overwrite").orc(path)
    if fmt_type == "xml":
        from amanogawa_spark.sources.writers import write_xml

        return lambda df: write_xml(
            prep(df),
            path,
            root_tag=fmt.get("root_tag", "rows"),
            row_tag=fmt.get("row_tag", "row"),
        )
    raise ValueError(f"unsupported sink format: {fmt_type!r}")


def load_config(path: str) -> Pipeline:
    """Parse a reference-style TOML job spec into a runnable Pipeline."""
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    base_dir = os.path.dirname(os.path.abspath(path))

    sources = _named_components(cfg.get("source"), "source")
    flows = _named_components(cfg.get("flow"), "flow")
    branches = _named_components(cfg.get("branch"), "branch")
    confluences = _named_components(cfg.get("confluence"), "confluence")
    sinks = _named_components(cfg.get("sink"), "sink")

    # branch `to` outputs are referenced by bare name in the reference configs
    alias: dict[str, str] = {}
    for name, spec in branches:
        for out in spec.get("to", []):
            alias[out["name"]] = f"{name}.{out['name']}"

    def ref(name: str) -> str:
        return alias.get(name, name)

    # anonymous linear wiring: source → flow → sink (simple.toml shape)
    def implicit_from(spec: dict, fallbacks: list[str]) -> str:
        if "from" in spec:
            return spec["from"]
        for fb in fallbacks:
            if fb:
                return fb
        raise ValueError("component needs a 'from' reference")

    p = Pipeline()
    for name, spec in sources:
        p.source(name, _source_fn(spec, base_dir))
    anon_source = sources[0][0] if len(sources) == 1 else None
    for name, spec in flows:
        p.flow(name, frm=ref(implicit_from(spec, [anon_source])), fn=_flow_fn(spec))
    anon_flow = flows[0][0] if len(flows) == 1 else None
    for name, spec in branches:
        outs = spec.get("to", [])
        p.branch(
            name,
            frm=ref(implicit_from(spec, [anon_flow, anon_source])),
            fn=partial(
                branch_columns,
                branches={o["name"]: o["columns"] for o in outs},
            ),
        )
    for name, spec in confluences:
        entries = spec.get("from") or spec.get("join")
        left, right = entries[0], entries[1]
        how = {"key": "inner", "inner_join": "inner", "outer_join": "full_outer"}[
            spec["type"]
        ]
        if how == "inner":
            fn = partial(
                key_join, left_key=left["key"], right_key=right["key"]
            )
        else:
            def fn(ldf, rdf, _lk=left["key"], _rk=right["key"]):
                return ldf.join(rdf, ldf[_lk] == rdf[_rk], "full_outer")
        p.confluence(name, left=ref(left["name"]), right=ref(right["name"]), fn=fn)
    for name, spec in sinks:
        p.sink(
            name,
            frm=ref(implicit_from(spec, [anon_flow, anon_source])),
            fn=_sink_fn(spec, base_dir),
        )
    return p


def run_config(path: str, spark: SparkSession) -> dict[str, DataFrame]:
    return load_config(path).run(spark)
