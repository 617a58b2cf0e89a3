"""Partitioning conventions for compute-heavy stages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition iff the input is narrower than the session's
    parallelism.

    CPU-heavy per-row stages (shingling, hashing, vector math)
    otherwise serialize on however few splits the scan produced —
    locally a single small parquet file; at scale a handful of
    well-compressed files whose rows expand 100x in flight. On a
    1000-executor cluster a 100 TB scan already has ~a million
    splits, making this a no-op; the round-robin shuffle only ever
    carries the narrow pre-projection payload.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
