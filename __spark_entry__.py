"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's windowed
activity count — reference: spark/spark_streaming.py:50-65) over
the sf0.001 fixtures. ``queries()`` / ``oracle_sql()`` expose the
engine's full operator catalog (SURVEY.md §2 + gap map + north-star
LLM ops) for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_flink_streaming_example_with_test_spark.plans.reference_queries import activity_windowed_count
    from spark_flink_streaming_example_with_test_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return activity_windowed_count(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from spark_flink_streaming_example_with_test_spark.plans.catalog import queries as catalog_queries
    from spark_flink_streaming_example_with_test_spark.session import apply_runtime_confs

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in catalog_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible
    query; omitted entries get the driver's rows-only check."""
    from spark_flink_streaming_example_with_test_spark.plans.catalog import oracle_sql as catalog_oracles

    return catalog_oracles()
