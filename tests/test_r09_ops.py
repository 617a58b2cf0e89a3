"""Round-9 pins: scale-limit fixes found by the 16x-replica sweep."""

from __future__ import annotations

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES
from tests.conftest import SF_DIR


def test_events_value_is_two_decimal(spark):
    """NUMERICS.md class-1 arguments (ROUND(SUM(value), 2) sites are
    half-boundary-safe) rest on `events.value` being an exactly
    2-decimal quantity, and the exact-integer migrations quantize it
    at 1e4 (safe through 4 decimals). If the driver ever regenerates
    the fixture with finer values, this pin fails and points at the
    audit doc instead of letting a silent boundary class back in."""
    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    n_bad = ev.filter(
        F.col("value") != F.round(F.col("value"), 2)
    ).count()
    assert n_bad == 0, (
        f"{n_bad} events.value rows are finer than 2 decimals — "
        "re-audit the ROUND(SUM(value), 2) sites per NUMERICS.md"
    )


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
