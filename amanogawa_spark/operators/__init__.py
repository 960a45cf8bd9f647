from amanogawa_spark.operators.etl import branch_columns, key_join, row_filter
from amanogawa_spark.operators.sampling import hash_sample, stratified_sample
from amanogawa_spark.operators.packing import pack_sequences
from amanogawa_spark.operators.quality import (
    c4_line_filter,
    redact_pii,
    repetition_features,
)
from amanogawa_spark.operators.sketch import (
    cms_query,
    cms_registers,
    hll_distinct,
    hll_registers,
)

__all__ = [
    "branch_columns",
    "key_join",
    "row_filter",
    "hash_sample",
    "stratified_sample",
    "pack_sequences",
    "c4_line_filter",
    "redact_pii",
    "repetition_features",
    "cms_query",
    "cms_registers",
    "hll_distinct",
    "hll_registers",
]
