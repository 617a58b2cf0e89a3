"""Batch table loaders for the driver fixtures (TESTDATA.md).

Parquet scans go through ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning; loaders
must NOT cache or materialize (that would block pushdown).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; we read nanos as int64
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microseconds — the same truncation DuckDB applies when casting
    TIMESTAMP_NS to TIMESTAMP, so oracle comparisons line up.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
