"""Deterministic synthetic activity generator — the engine's analog
of the reference's Kafka producer (reference:
generate_data/kafka_producer.py:34-52,64-86: 10 user ids, 4 event
types, one event per 0.8 s, faker URL), re-expressed as a
distributed ``spark.range`` projection.

Two deliberate differences from the reference, both scale-driven:
deterministic modular arithmetic instead of ``random``/faker (every
run, engine, and partition produces identical rows — reproducible
fixtures, SQL-expressible oracle), and a lazy distributed range
instead of a single-threaded producer loop (generating 10^12 rows is
a partitioned map, not a driver bottleneck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference event-type universe (generate_data/kafka_producer.py:15)
EVENT_TYPES = ("liked", "viewed", "bookmarked", "commented")

#: 2023-08-25 00:00:00 UTC in microseconds — the spark-test.py golden
#: date, micros so the 0.8 s cadence stays exact.
_BASE_MICROS = 1_692_921_600_000_000
_CADENCE_MICROS = 800_000


def synthetic_activity(
    spark: SparkSession,
    n: int = 10_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """n deterministic activity events: user 1-10, cycling event
    type, event time advancing 0.8 s per event, synthetic URL.
    Schema matches the reference's flattened activity row."""
    ids = (
        spark.range(0, n, 1, num_partitions)
        if num_partitions
        else spark.range(n)
    )
    types = F.array(*[F.lit(t) for t in EVENT_TYPES])
    return ids.select(
        (F.col("id") % 10 + 1).alias("user_id"),
        F.element_at(types, (F.col("id") % 4 + 1).cast("int")).alias(
            "event_type"
        ),
        F.timestamp_micros(
            F.lit(_BASE_MICROS) + F.col("id") * _CADENCE_MICROS
        ).alias("ts"),
        F.concat(
            F.lit("https://example.com/page/"), (F.col("id") % 100)
        ).alias("url"),
    )
