"""Bucketed tables: pre-shuffled storage for co-located joins.

A join between two tables bucketed by the same key into the same
bucket count needs NO exchange at query time — each task reads
matching buckets from both sides. At 100 TB this converts the
biggest repeated cost (re-shuffling a fact table for every join) into
a one-time cost at write. The canonical use: bucket ``lineitem`` and
``orders`` by orderkey once, then every orderkey join is shuffle-free.

Spark implements this via ``DataFrameWriter.bucketBy`` + catalog
tables (plain parquet paths carry no bucket metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets sort-merge joins skip the sort step
    too — the join degenerates to a streamed merge of pre-sorted
    files.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table through the catalog (required —
    ``spark.read.parquet`` on the files would drop bucket info)."""
    return spark.table(table)
