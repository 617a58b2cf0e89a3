"""Catalog-wide driver-output schema guard (verdict r06 item #2).

The driver's correctness gate canonicalizes each query result with
pandas ``sort_values``/``factorize``; a top-level Array/Map/Struct
column makes cells unhashable and turns the row into ``err`` (the
round-6 ``embedding_pq_codes`` failure). The local oracle compare
tuple-izes arrays and passes anyway, so this class of driver-only
failure gets its own catalog-wide pin here, plus an execution-time
hook in ``tests/compare.py::assert_df_matches_oracle`` that covers
the streaming replays during the parity sweep.

Non-streaming queries are checked lazily (plan build only, no job),
so this module is fast enough to run standalone.
"""

from __future__ import annotations

import pytest

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES
from tests.compare import assert_flat_schema
from tests.conftest import SF_DIR

# streaming_* callables execute a bounded stream replay before
# returning their result frame — expensive here, but their schemas
# are still guarded by the assert_flat_schema hook inside
# assert_df_matches_oracle during the full parity sweep.
LAZY_NAMES = [n for n in QUERIES if not n.startswith("streaming_")]


@pytest.mark.parametrize("name", LAZY_NAMES)
def test_catalog_query_schema_is_flat(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert_flat_schema(df, context=name)


def test_lateral_alias_kpi_emits_double_share(spark):
    """Pin the concrete r08 fix: high_share is DOUBLE via the integer
    half-up construction, not the decimal(29,6) that ROUND(x*1.0/n, 6)
    produces through the SQL front-end (the round-8 driver's only hash
    mismatch — Spark stringifies '0.369890' vs oracle DOUBLE '0.36989')."""
    df = QUERIES["lateral_column_alias_kpi"].fn(spark, SF_DIR)
    assert df.schema["high_share"].dataType.simpleString() == "double"


def test_decimal_guard_trips_on_decimal_column(spark):
    """The no-DecimalType guard must FAIL on the reverted form (ROUND of
    a *1.0 quotient in Spark SQL emits decimal) — proves the guard sees
    the class the local normalizer deliberately collapses."""
    df = spark.sql("SELECT ROUND(3 * 1.0 / 7, 6) AS share")
    assert df.schema["share"].dataType.simpleString().startswith("decimal")
    with pytest.raises(AssertionError, match="DecimalType"):
        assert_flat_schema(df, context="decimal-guard-selftest")


def test_embedding_pq_codes_emits_string_codes(spark):
    """Pin the concrete r06 fix: codes is array_join-ed to a string
    (fails on revert to the array<bigint> form)."""
    df = QUERIES["embedding_pq_codes"].fn(spark, SF_DIR)
    assert df.schema["codes"].dataType.simpleString() == "string"
