"""Arrow/numpy sink parity (reference sink.numpy, numpy.cpp:21-50)."""

from __future__ import annotations

import numpy as np

from amanogawa_spark.sources.numpy_sink import to_arrow_table, to_numpy, to_pandas


def test_to_numpy_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(100)], "id long, x double"
    )
    arr = to_numpy(df.orderBy("id"))
    assert arr.shape == (100, 2)
    assert np.allclose(arr[:, 1], np.arange(100) * 1.5)


def test_to_arrow(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    t = to_arrow_table(df)
    assert t.num_rows == 2
    assert t.column_names == ["id", "s"]


def test_to_pandas(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    pdf = to_pandas(df)
    assert list(pdf.columns) == ["id", "s"]
