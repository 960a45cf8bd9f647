from amanogawa_spark.functions.html import extract_links, extract_text
from amanogawa_spark.functions.robots import robots_decisions, robots_filter

__all__ = [
    "extract_links",
    "extract_text",
    "robots_decisions",
    "robots_filter",
]
