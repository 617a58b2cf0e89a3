"""Partitioning conventions for compute-heavy stages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition iff the input scan is narrower than the session's
    parallelism.

    CPU-heavy per-row stages (shingling, hashing, vector math)
    otherwise serialize on however few splits the scan produced —
    locally a single small parquet file; at scale a handful of
    well-compressed files whose rows expand 100x in flight. On a
    1000-executor cluster a 100 TB scan already has ~a million
    splits, making this a no-op; the round-robin shuffle only ever
    carries the narrow pre-projection payload.

    The width probe is ``inputFiles()`` (a pure-metadata call on the
    analyzed plan), not ``df.rdd.getNumPartitions()`` — the RDD
    bridge forces a full plan conversion per call and throws on
    streaming DataFrames. Streaming inputs pass through untouched
    (micro-batch sizing owns their parallelism); plans with no file
    provenance (in-memory test frames) count as 1 source split.
    """
    if df.isStreaming:
        return df
    target = target or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_splits = max(len(df.inputFiles()), 1)
    except Exception:
        n_splits = 1
    if n_splits < target:
        return df.repartition(target)
    return df
