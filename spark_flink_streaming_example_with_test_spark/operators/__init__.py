from spark_flink_streaming_example_with_test_spark.operators.activity import (
    clean_activity,
    filter_event_types,
    flatten_window,
    parse_activity,
    windowed_counts,
)

__all__ = [
    "parse_activity",
    "clean_activity",
    "filter_event_types",
    "windowed_counts",
    "flatten_window",
]
