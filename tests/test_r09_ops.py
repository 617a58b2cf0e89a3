"""Round-9 pins: scale-limit fixes found by the 16x-replica sweep."""

from __future__ import annotations

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES
from tests.conftest import SF_DIR


def test_recursive_cte_row_limit_raised(spark):
    """The 16x-replica sweep (2.4M events) hit Spark 4's default
    cumulative recursion row limit of 1e6 (RECURSION_ROW_LIMIT_
    EXCEEDED): the recursion emits one row per event overall, so the
    default caps the query at a 1M-event corpus. The query fn must
    raise the limit alongside the level limit it already raises."""
    spark.conf.set("spark.sql.cteRecursionRowLimit", "1000000")
    QUERIES["sessionize_recursive_cte"].fn(spark, SF_DIR)
    assert spark.conf.get("spark.sql.cteRecursionRowLimit") == "1000000000"
    assert spark.conf.get("spark.sql.cteRecursionLevelLimit") == "1000"
