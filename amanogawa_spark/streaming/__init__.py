from amanogawa_spark.streaming.events import streaming_event_counts

__all__ = ["streaming_event_counts"]
