"""Mirror of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle on the same parquet, compare
row-count + order-insensitive values. Queries without an oracle get
a schema/determinism smoke check (run twice, same result).
"""

from __future__ import annotations

import duckdb
import pytest

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES
from spark_flink_streaming_example_with_test_spark.sources.tables import TABLES
from tests.compare import assert_df_matches_oracle, normalize
from tests.conftest import SF_DIR

ORACLE_NAMES = [n for n, s in QUERIES.items() if s.oracle]
ROWS_ONLY_NAMES = [n for n, s in QUERIES.items() if not s.oracle]


@pytest.fixture(scope="module")
def duck():
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the
        # replica-scale fixtures); the driver fixtures are single
        # files — glob accordingly so the same sweep runs on both.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    rel = duck.sql(spec.oracle)
    assert_df_matches_oracle(sdf, rel, context=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_is_deterministic(spark, name):
    spec = QUERIES[name]
    first = normalize(spec.fn(spark, SF_DIR).toPandas())
    second = normalize(spec.fn(spark, SF_DIR).toPandas())
    assert first == second, f"{name}: nondeterministic output"
