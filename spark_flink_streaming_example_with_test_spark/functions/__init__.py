from spark_flink_streaming_example_with_test_spark.functions.partitioning import ensure_min_partitions

__all__ = ["ensure_min_partitions"]
