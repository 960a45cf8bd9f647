from amanogawa_spark.fixtures.pages import generate_pages, write_pages_parquet

__all__ = ["generate_pages", "write_pages_parquet"]
