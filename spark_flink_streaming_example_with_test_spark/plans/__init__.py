from spark_flink_streaming_example_with_test_spark.plans.catalog import (
    HEADLINE_QUERIES,
    QUERIES,
    QuerySpec,
    oracle_sql,
    queries,
)

__all__ = ["QUERIES", "HEADLINE_QUERIES", "QuerySpec", "queries", "oracle_sql"]
