"""Zero-copy-ish Arrow handoff to numpy/pandas — reference ``sink.numpy`` parity.

The reference scaffolds an experimental Arrow-buffer → ``arrow::Tensor`` →
ndarray handoff (``plugin/sink/numpy/numpy.cpp:21-50``, disabled in its
build). Spark gives the same capability through the Arrow collect path:
``toArrow()`` (Spark 4) / Arrow-enabled ``toPandas()``.

Driver-side materialization — only for result sets that fit on the driver
(tops of rankings, aggregates), never for full tables at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def to_arrow_table(df: DataFrame):
    """DataFrame → pyarrow.Table via the Arrow collect path."""
    return df.toArrow()


def to_pandas(df: DataFrame) -> pd.DataFrame:
    return df.toPandas()


def to_numpy(df: DataFrame, columns: list[str] | None = None) -> np.ndarray:
    """Numeric columns → 2-D ndarray (rows x cols), Arrow-mediated."""
    pdf = df.select(*(columns or df.columns)).toPandas()
    return pdf.to_numpy()
