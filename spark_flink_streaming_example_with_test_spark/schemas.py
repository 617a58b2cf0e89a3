"""Schema registry.

The activity schema is the reference's native stream record
(reference: spark/spark_streaming.py:28-37, re-declared at
spark/spark_test/spark-test.py:17-26). Fixture schemas follow
FIXTURES.md §B.
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Nested event payload: {"event_type": ..., "url": ...}
EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("url", StringType()),
    ]
)

#: Full user-activity record; ``date`` is epoch MILLIS event time.
ACTIVITY_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("date", LongType()),
        StructField("event", EVENT_SCHEMA),
    ]
)

#: Event-type universe emitted by the reference's producer
#: (reference: generate_data/kafka_producer.py:15).
ACTIVITY_EVENT_TYPES = ("liked", "viewed", "bookmarked", "commented")

#: The flagship pipeline keeps these (reference: spark/spark_streaming.py:60-62).
FLAGSHIP_KEEP_TYPES = ("liked", "commented")

#: The passthrough variant adds bookmarked
#: (reference: flink/src/main/java/com/flink/UserActivityInsert.java:54-60).
PASSTHROUGH_KEEP_TYPES = ("liked", "bookmarked", "commented")

#: JSON payload of the fixture ``events.props`` column (TESTDATA.md).
EVENTS_PROPS_SCHEMA = "k INT"
