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

#: Unexecuted-plan cache (r14 optimization): ``spark.read.parquet``
#: costs ~85 ms of driver-side py4j/schema work per call, and a
#: 6-table query (TPC-H q5) pays it six times PER PASS — ~0.5 s of
#: the bench second for zero data work. The cache stores the lazy
#: DataFrame handle (a logical plan over the parquet files), never
#: rows: every action still scans the parquet input, so this is a
#: plan-construction memo, not result caching. Keyed (ADVICE r14
#: hardening) by SESSION identity (``id(spark)`` — newSession()
#: shares an applicationId but carries its own runtime conf, so a
#: handle bound to one session is never served to another),
#: directory, table, and the file's (mtime, size) fingerprint — a
#: rewritten fixture (the empty-input sweeps write derived tables)
#: invalidates its entry even on filesystems with 1 s mtime
#: granularity, where size breaks most same-second ties. Stale
#: fingerprints for the same (session, dir, table) are EVICTED on
#: insert, so sweeps that rewrite derived fixtures in a loop don't
#: grow the dict unboundedly.
_PLAN_CACHE: dict[tuple[int, str, str, str], tuple[tuple[float, int], DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    ``events.ts`` has shipped in two physical layouts across fixture
    generations: parquet TIMESTAMP(NANOS) (read as int64 via
    ``spark.sql.legacy.parquet.nanosAsLong`` and truncated to
    microseconds — the same truncation DuckDB applies casting
    TIMESTAMP_NS to TIMESTAMP) and, in newer fixtures, plain
    TIMESTAMP(MICROS) NTZ which needs no conversion. The nanos->long
    conversion is therefore guarded on the column's actual dtype;
    this also covers DERIVED events tables (filtered/empty copies
    written by tests or downstream jobs), where blindly dividing a
    timestamp by 1000 is an analysis error.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        fingerprint = (st.st_mtime, st.st_size)
    except OSError:
        fingerprint = (-1.0, -1)  # missing path: reader raises loudly
    key = (id(spark), spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None and cached[0] == fingerprint:
        return cached[1]
    df = _read_table(spark, path, name)
    _PLAN_CACHE[key] = (fingerprint, df)  # replaces any stale fingerprint
    return df


def _read_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Normalize to the session-tz TIMESTAMP every consumer was
            # written against (UTC session -> same instant); NTZ also
            # rejects casts LTZ allows (e.g. to double for epoch math).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
