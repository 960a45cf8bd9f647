"""Pipeline DAG builder + structured streaming smoke tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.operators.etl import key_join, row_filter
from amanogawa_spark.plans.pipeline import Pipeline


def test_pipeline_basic_dag(spark, tmp_path):
    """Mirrors the reference's basic.toml: source → filter → branch → join → sinks."""
    out_dir = str(tmp_path / "sink_out")

    p = Pipeline()
    p.source(
        "kinmosa",
        lambda s: s.createDataFrame(
            [(1, "youko", 1), (2, "aya", 2), (3, "shino", 3)],
            "id int, name string, blood_type int",
        ),
    )
    p.source(
        "blood",
        lambda s: s.createDataFrame([(1, "A"), (2, "B"), (3, "O")], "id int, type_string string"),
    )
    p.flow("filtered", frm="kinmosa", fn=lambda df: row_filter(df, "id", "<=", 2))
    p.branch(
        "split",
        frm="filtered",
        fn=lambda df: {"id_name": df.select("id", "name"), "blood": df.select("id", "blood_type")},
    )
    p.confluence(
        "joined",
        left="split.blood",
        right="blood",
        fn=lambda l, r: key_join(l, r, "blood_type", "id"),
    )
    p.sink("out", frm="joined", fn=lambda df: df.write.mode("overwrite").parquet(out_dir))
    slots = p.run(spark)

    assert slots["filtered"].count() == 2
    back = spark.read.parquet(out_dir)
    assert {(r.id, r.type_string) for r in back.collect()} == {(1, "A"), (2, "B")}


def test_pipeline_cycle_detection(spark):
    p = Pipeline()
    p.flow("a", frm="b", fn=lambda df: df)
    p.flow("b", frm="a", fn=lambda df: df)
    with pytest.raises(ValueError, match="Not a DAG"):
        p.run(spark)


def test_streaming_windowed_counts(spark, tmp_path):
    import shutil

    from amanogawa_spark.streaming.events import run_stream_once, streaming_event_counts

    sf_dir = "/root/testdata/sf0.001"
    # the file-stream source requires a directory of files, not a single file
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    agg = streaming_event_counts(spark, str(stream_dir), window="1 hour")
    name = run_stream_once(agg, "evt_counts")
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() > 0
    # streaming totals equal the batch totals
    batch_total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.agg(F.sum("n")).collect()[0][0] == batch_total


def test_streaming_stateful_sessionize(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): sessions survive
    across micro-batches in the state store; closure is event-time-driven."""
    import pandas as pd

    from amanogawa_spark.streaming.events import streaming_sessionize

    stream_dir = tmp_path / "sess_stream"
    stream_dir.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
        # Spark TimestampType is microseconds; pandas defaults to nanos
        pdf.to_parquet(
            stream_dir / name, coerce_timestamps="us", allow_truncated_timestamps=True
        )

    t0 = "2025-06-01 10:00:00"
    # batch 1: user 1 has two events 5 min apart (one open session)
    write_batch(
        "b1.parquet",
        [
            (1, t0, 1, "click", 1.0, "{}"),
            (2, "2025-06-01 10:05:00", 1, "click", 1.0, "{}"),
        ],
    )
    sessions = streaming_sessionize(spark, str(stream_dir), gap_seconds=1800)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM sess_out").count() == 0  # still open

    # batch 2: user 1 reappears 2 h later -> first session must close
    write_batch("b2.parquet", [(3, "2025-06-01 12:00:00", 1, "click", 1.0, "{}")])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 1 and r.n_events == 2
    assert r.session_start.strftime("%H:%M") == "10:00"
    assert r.session_end.strftime("%H:%M") == "10:05"


def test_streaming_dedup_exact(spark, tmp_path):
    """Watermarked streaming dedup keeps one doc per content fingerprint
    across micro-batches; batch dedup_exact agrees on the survivor count."""
    from datetime import datetime, timedelta

    from amanogawa_spark.streaming.events import streaming_dedup_exact

    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    base = datetime(2026, 1, 1)
    rows1 = [
        (0, base, "alpha beta"),
        (1, base + timedelta(minutes=1), "Alpha  Beta"),  # normalizes to dup of 0
        (2, base + timedelta(minutes=2), "gamma"),
    ]
    rows2 = [
        (3, base + timedelta(minutes=3), "alpha beta"),  # dup across batches
        (4, base + timedelta(minutes=4), "delta"),
    ]
    schema = "doc_id long, ts timestamp, text string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(
        str(stream_dir)
    )
    dedup = streaming_dedup_exact(spark, str(stream_dir))
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("docs_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(
        str(stream_dir)
    )
    q.processAllAvailable()
    q.stop()
    out = {r.doc_id for r in spark.sql("SELECT doc_id FROM docs_dedup").collect()}
    # doc 1 (same normalized text as 0) and doc 3 (cross-batch dup) dropped
    assert out == {0, 2, 4}
    # batch path agrees on the survivor count
    from amanogawa_spark.operators.dedup import dedup_exact

    all_docs = spark.createDataFrame(rows1 + rows2, schema)
    assert dedup_exact(all_docs).count() == 3


def test_streaming_graph_ingest_equals_batch_rebuild(spark, tmp_path):
    """Two crawl micro-batches through streaming_graph_ingest must leave a
    store whose resolved graph EXACTLY equals a batch build over all pages
    — including links whose target page only arrived in the later batch."""
    import pandas as pd

    from amanogawa_spark.fixtures.pages import generate_pages
    from amanogawa_spark.graph.build import build_edges, build_vertices
    from amanogawa_spark.streaming.ingest import (
        resolve_id_edges,
        streaming_graph_ingest,
    )

    corpus = generate_pages(n_pages=120, seed=11)
    pdf = corpus.pages
    in_dir = tmp_path / "pages_in"
    in_dir.mkdir()
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    # batch 1: first 70 pages
    spark.createDataFrame(pdf.iloc[:70]).coalesce(1).write.parquet(
        str(in_dir / "b1")
    )
    q = streaming_graph_ingest(spark, str(in_dir) + "/*", store, checkpoint_dir=ck)
    q.processAllAvailable()

    # batch 2: the rest (arrives later; earlier dangling links now resolve)
    spark.createDataFrame(pdf.iloc[70:]).coalesce(1).write.parquet(
        str(in_dir / "b2")
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.src_id, r.dst_id) for r in resolve_id_edges(spark, store).collect()
    }

    all_pages = spark.createDataFrame(pdf)
    v = build_vertices(all_pages, id_mode="hash")
    expect = {
        (r.src_id, r.dst_id) for r in build_edges(all_pages, v).collect()
    }
    assert got == expect and len(got) > 0

    # idempotence: replaying the same files appends nothing
    n_v = spark.read.parquet(store + "/vertices").count()
    n_e = spark.read.parquet(store + "/edges_url").count()
    q2 = streaming_graph_ingest(
        spark, str(in_dir) + "/*", store, checkpoint_dir=str(tmp_path / "ck2")
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(store + "/vertices").count() == n_v
    assert spark.read.parquet(store + "/edges_url").count() == n_e


def test_streaming_neardup_bands_matches_batch_mirror(spark, tmp_path):
    """LSH band-collision near-dup flags on the stream equal a first-seen
    replay of the SAME band signatures in ts order (batch mirror)."""
    from datetime import datetime, timedelta

    from amanogawa_spark.streaming.events import (
        band_signature_rows,
        streaming_neardup_bands,
    )

    base = datetime(2026, 1, 1)
    d0 = "the quick brown fox jumps over the lazy dog near the river bank today"
    d1 = d0.replace("today", "tonight")  # near-dup: shares most shingles
    d2 = (
        "completely different content about distributed analytics engines "
        "and columnar parquet scans at scale"
    )
    rows1 = [(0, base, d0)]
    rows2 = [(1, base + timedelta(minutes=1), d1), (2, base + timedelta(minutes=2), d2)]
    schema = "doc_id long, ts timestamp, text string"
    stream_dir = tmp_path / "neardup_stream"
    stream_dir.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(
        str(stream_dir)
    )
    q = (
        streaming_neardup_bands(spark, str(stream_dir), watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_nd"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(
        str(stream_dir)
    )
    q.processAllAvailable()
    # two flush batches: the first advances the watermark past the doc
    # window, the second triggers the append-mode emission
    for h in (3, 4):
        spark.createDataFrame(
            [(90 + h, base + timedelta(hours=h), "watermark flush row")], schema
        ).coalesce(1).write.mode("append").parquet(str(stream_dir))
        q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: bool(r.is_fresh)
        for r in spark.sql("SELECT doc_id, is_fresh FROM neardup_out").collect()
        if r.doc_id < 10
    }

    # batch mirror: replay the identical band signatures in ts order
    batch = spark.createDataFrame(rows1 + rows2, schema)
    sig_rows = band_signature_rows(batch).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(sig_rows, key=lambda r: (r["ts"], r["doc_id"])):
        by_doc.setdefault(r["doc_id"], []).append((r["band"], r["sig"]))
    seen: set = set()
    want = {}
    for doc in sorted(by_doc):  # doc ids are in ts order in this fixture
        fresh = all((b, s) not in seen for b, s in by_doc[doc])
        want[doc] = fresh
        seen.update(by_doc[doc])
    assert got == want
    assert want[0] is True and want[1] is False and want[2] is True


def test_streaming_psi_matches_hand_mirror(spark, tmp_path):
    """Windowed streaming histogram + batch PSI post-agg == a numpy-style
    hand mirror per window (same Laplace smoothing as operators/drift)."""
    import datetime as dt
    import math

    from amanogawa_spark.streaming.events import run_stream_once
    from amanogawa_spark.streaming.monitor import (
        baseline_bins,
        streaming_bin_counts,
        window_psi,
    )

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    breaks = [2.0, 5.0]

    def ev(i, minute, value):
        return (i, t0 + dt.timedelta(minutes=minute), 1, "q", float(value), "{}")

    # window 1 (min 0-4): values skewed low; window 2 (min 5-9): skewed high
    w1 = [ev(i, 1, v) for i, v in enumerate([1, 1, 1, 3, 6])]
    w2 = [ev(10 + i, 6, v) for i, v in enumerate([6, 6, 6, 3, 1])]
    spark.createDataFrame(
        w1 + w2,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "ev"))

    base = spark.createDataFrame(
        [(float(v),) for v in [1, 1, 3, 3, 6, 6]], ["value"]
    )
    baseline = baseline_bins(base, "value", breaks)
    assert {(r["bin"], r["n_b"]) for r in baseline.collect()} == {(0, 2), (1, 2), (2, 2)}

    counts = streaming_bin_counts(
        spark, str(tmp_path / "ev"), "value", breaks, window="5 minutes"
    )
    name = run_stream_once(counts, "psi_counts")
    got = window_psi(spark.table(name), baseline, breaks).collect()
    rows = {r["window_start"].minute: (r["n"], r["psi_r"]) for r in got}
    assert set(rows) == {0, 5}

    def hand_psi(counts_by_bin, base_by_bin, n_bins=3, s=0.5):
        na, nb = sum(counts_by_bin), sum(base_by_bin)
        tot = 0.0
        for ca, cb in zip(counts_by_bin, base_by_bin):
            pa = (ca + s) / (na + s * n_bins)
            pb = (cb + s) / (nb + s * n_bins)
            tot += (pa - pb) * math.log(pa / pb)
        return round(tot, 8)

    # w1 bins: [3 under-2, 1 mid, 1 over-5]; w2: [1, 1, 3]
    assert rows[0][0] == 5 and abs(rows[0][1] - hand_psi([3, 1, 1], [2, 2, 2])) < 1e-8
    assert rows[5][0] == 5 and abs(rows[5][1] - hand_psi([1, 1, 3], [2, 2, 2])) < 1e-8
    # the skew directions differ but both windows drift from the flat baseline
    assert rows[0][1] > 0 and rows[5][1] > 0
