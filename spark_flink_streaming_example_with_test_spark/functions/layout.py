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


def zorder_value(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative integer keys:
    bit i of each key maps to bits 2i / 2i+1 of the result, so rows
    close in BOTH dimensions get close z-values. Pure expressions
    (shifts + masks), JVM-side."""
    from pyspark.sql import Column, functions as F

    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write: range-partition on the Morton value
    of (col_a, col_b) and sort within each file, so each output file
    covers a compact rectangle-ish region of the 2-D key space.

    Why it matters at 100 TB: parquet readers skip row groups via
    column min/max statistics. A single-column sort gives skipping
    on that column only; Z-ordering gives USABLE min/max ranges on
    BOTH columns simultaneously, so selective 2-D box predicates
    (time range x key range, user x date) touch a small fraction of
    files instead of all of them. This is the open-format analog of
    lakehouse OPTIMIZE ZORDER BY.
    """
    z = zorder_value(col_a, col_b, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
