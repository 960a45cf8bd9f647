"""IVFADC (operators/pq.py ivf_pq_topk)."""

from __future__ import annotations

from amanogawa_spark.operators.pq import ivf_pq_topk, pq_adc_topk, pq_encode

M, K, DSUB = 4, 4, 2  # dim 8


def _books():
    # dyadic codebooks — exact distance sums
    return [
        [[((s * 5 + c * 3 + j) % 7 - 3) / 4.0 for j in range(DSUB)] for c in range(K)]
        for s in range(M)
    ]


def _vecs(n):
    return [(i, [((i * 11 + j * 3) % 13 - 6) / 4.0 for j in range(8)]) for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries():
    return [(qi, [((qi * 7 + j * 5) % 11 - 5) / 4.0 for j in range(8)]) for qi in range(3)]


def _coarse(rows, stride=8):
    return [(i, v) for i, v in rows if i % stride == 0]


def test_ivfpq_all_lists_equals_flat_adc(spark):
    rows = _vecs(24)
    df = _df(spark, rows)
    books = _books()
    coarse = _coarse(rows, stride=8)  # 3 lists
    flat = pq_adc_topk(pq_encode(df, books), _queries(), books, k=4)
    ivf = ivf_pq_topk(df, books, _queries(), coarse, nprobe=len(coarse), k=4)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, flat.collect()))


def test_ivfpq_probed_subset_and_ranked(spark):
    rows = _vecs(24)
    df = _df(spark, rows)
    books = _books()
    coarse = _coarse(rows, stride=8)
    out = ivf_pq_topk(df, books, _queries(), coarse, nprobe=1, k=4).collect()
    assert len(out) > 0
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rn"])
        dists = [r["adist"] for r in rs]
        assert dists == sorted(dists)
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))
    # nprobe=1 scores at most one list's members per query
    flat = {
        (r["query_id"], r["id"])
        for r in pq_adc_topk(pq_encode(df, books), _queries(), books, k=24).collect()
    }
    assert all((r["query_id"], r["id"]) in flat for r in out)


def test_ivfpq_repartition_invariant_no_cartesian(spark):
    rows = _vecs(24)
    books = _books()
    coarse = _coarse(rows, stride=8)
    a = ivf_pq_topk(_df(spark, rows), books, _queries(), coarse, nprobe=2, k=3)
    b = ivf_pq_topk(
        _df(spark, rows).repartition(7), books, _queries(), coarse, nprobe=2, k=3
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
