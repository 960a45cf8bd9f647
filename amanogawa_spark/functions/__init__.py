from amanogawa_spark.functions.html import extract_links, extract_text

__all__ = ["extract_links", "extract_text"]
