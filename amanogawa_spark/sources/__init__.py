from amanogawa_spark.sources.readers import read_csv, read_json, read_xml
from amanogawa_spark.sources.writers import write_csv, write_json, write_parquet

__all__ = [
    "read_csv",
    "read_json",
    "read_xml",
    "write_csv",
    "write_json",
    "write_parquet",
]
