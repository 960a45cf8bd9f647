from amanogawa_spark.functions.html import extract_links, extract_text
from amanogawa_spark.functions.robots import robots_decisions, robots_filter
from amanogawa_spark.functions.url import normalize_url, registered_domain, surt_key

__all__ = [
    "extract_links",
    "extract_text",
    "robots_decisions",
    "robots_filter",
    "normalize_url",
    "registered_domain",
    "surt_key",
]
