"""Robustness: every catalog query must execute (possibly to an
empty result) on zero-row inputs with the production schemas — the
degenerate partitions a 100 TB job hits constantly (empty files,
fully-filtered splits, cold-start streams) must never crash an
operator."""

from __future__ import annotations

import pytest

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES
from spark_flink_streaming_example_with_test_spark.sources.tables import TABLES, load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    """Schema-identical, zero-row copy of every fixture table."""
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        # Read through the raw reader (not load_table) so the
        # written schema matches the on-disk fixture layout.
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    df = QUERIES[name].fn(spark, empty_sf_dir)
    n = df.count()
    # Global aggregates may emit one all-null/zero row; everything
    # else must be empty. Either way: no exception is the contract.
    assert n >= 0
