from amanogawa_spark.operators.etl import branch_columns, key_join, row_filter

__all__ = ["branch_columns", "key_join", "row_filter"]
