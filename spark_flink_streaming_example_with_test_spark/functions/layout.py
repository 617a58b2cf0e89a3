"""Storage layout: hive-partitioned writes for partition pruning.

Partition pruning is the highest-leverage scan optimization at
100 TB: a filter on the partition column skips whole directories at
planning time — zero IO for excluded partitions, visible as
``PartitionFilters`` on the scan node. Typical layout for the events
stream: partition by event date, so time-bounded queries read only
their days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet (dir-per-value layout).

    Keep partition cardinality modest (dates, categories — not user
    ids): each value is a directory, and tiny partitions create the
    small-files problem the layout is meant to avoid.
    """
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; partition columns come back as
    regular columns and filters on them prune directories."""
    return spark.read.parquet(path)
