"""Golden-DataFrame tests of the flagship pipeline.

Reproduces the reference's chispa test strategy and expected rows
(reference: spark/spark_test/spark-test.py:31-83; FIXTURES.md §A):
mixed-case event types, a VIEWED row that must vanish, timestamps
straddling a 1-minute window boundary, exact window bounds.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from spark_flink_streaming_example_with_test_spark.operators.activity import (
    clean_activity,
    filter_event_types,
    flagship_pipeline,
    flatten_window,
    parse_activity,
    split_by_event_types,
    windowed_counts,
)
from spark_flink_streaming_example_with_test_spark.schemas import ACTIVITY_SCHEMA
from tests.compare import assert_rows_equal


def _utc(y, mo, d, h, mi, s):
    return datetime(y, mo, d, h, mi, s)  # session tz pinned UTC


# Golden input (reference: spark-test.py:31-37): epoch millis around
# 2023-08-25 00:12-00:13 UTC; 1692922320000 == 00:12:00.
GOLDEN_INPUT = [
    ("1", 1692922334000, {"event_type": "Liked", "url": "https://a.example/1"}),
    ("1", 1692922365000, {"event_type": "LIKED", "url": "https://a.example/2"}),
    ("1", 1692922365000, {"event_type": "Commented", "url": "https://a.example/3"}),
    ("2", 1692922399000, {"event_type": "VIEWED", "url": "https://a.example/4"}),
    ("2", 1692922401000, {"event_type": "liked", "url": "https://a.example/5"}),
]


def _golden_df(spark):
    rows = [(i, d, (e["event_type"], e["url"])) for i, d, e in GOLDEN_INPUT]
    return spark.createDataFrame(rows, schema=ACTIVITY_SCHEMA)


def test_flagship_golden_counts(spark):
    """The reference's exact expectation (spark-test.py:57-61):
    (1, liked, 00:12, 00:13, 2), (1, commented, 00:12, 00:13, 1),
    (2, liked, 00:13, 00:14, 1)."""
    out = flagship_pipeline(_golden_df(spark))
    expected = pd.DataFrame(
        {
            "id": ["1", "1", "2"],
            "event_type": ["liked", "commented", "liked"],
            "window_start": [
                _utc(2023, 8, 25, 0, 12, 0),
                _utc(2023, 8, 25, 0, 12, 0),
                _utc(2023, 8, 25, 0, 13, 0),
            ],
            "window_end": [
                _utc(2023, 8, 25, 0, 13, 0),
                _utc(2023, 8, 25, 0, 13, 0),
                _utc(2023, 8, 25, 0, 14, 0),
            ],
            "count": [2, 1, 1],
        }
    )
    assert_rows_equal(out, expected, "flagship golden")


def test_parse_activity_from_kafka_envelope(spark):
    """Binary Kafka value -> typed rows (spark_streaming.py:50-51),
    including PERMISSIVE null on malformed JSON."""
    payloads = [
        ('{"id": "7", "date": 1692922334000, '
         '"event": {"event_type": "liked", "url": "u"}}',),
        ("not json at all",),
    ]
    raw = spark.createDataFrame(payloads, ["value"]).selectExpr(
        "CAST(value AS BINARY) AS value"
    )
    parsed = parse_activity(raw).collect()
    ok = [r for r in parsed if r.id is not None]
    bad = [r for r in parsed if r.id is None]
    assert len(ok) == 1 and len(bad) == 1
    assert ok[0].event.event_type == "liked"
    assert ok[0].date == 1692922334000


def test_clean_activity_millis_precision(spark):
    """timestamp_millis keeps sub-second precision (the reference's
    from_unixtime path truncates to seconds — engine standardizes)."""
    df = spark.createDataFrame(
        [("1", 1692922334123, ("liked", "u"))], schema=ACTIVITY_SCHEMA
    )
    row = clean_activity(df).collect()[0]
    assert row.date == datetime(2023, 8, 25, 0, 12, 14, 123000)
    assert row.event_type == "liked"


def test_filter_null_safety(spark):
    """Null event_type must not match (Flink twin's null check,
    UserActivityFilterAgg.java:97-99)."""
    df = spark.createDataFrame(
        [("1", 1, ("liked", "u")), ("2", 2, (None, "u")), ("3", 3, ("LIKED", "u"))],
        schema=ACTIVITY_SCHEMA,
    )
    cleaned = clean_activity(df)
    kept = filter_event_types(cleaned, ["liked", "commented"]).collect()
    assert sorted(r.id for r in kept) == ["1", "3"]


def test_passthrough_keep_list(spark):
    """UserActivityInsert variant: 3-element keep list incl.
    bookmarked (UserActivityInsert.java:54-60)."""
    df = spark.createDataFrame(
        [
            ("1", 1, ("liked", "u")),
            ("2", 2, ("bookmarked", "u")),
            ("3", 3, ("viewed", "u")),
            ("4", 4, ("commented", "u")),
        ],
        schema=ACTIVITY_SCHEMA,
    )
    kept = filter_event_types(clean_activity(df), ["liked", "bookmarked", "commented"])
    assert sorted(r.id for r in kept.collect()) == ["1", "2", "4"]


def test_split_by_event_types_partitions_everything(spark):
    """Stream split (spark_streaming.py:63,95-101): matching + rest
    must cover all rows, including null event types."""
    df = spark.createDataFrame(
        [("1", 1, ("liked", "u")), ("2", 2, (None, "u")), ("3", 3, ("viewed", "u"))],
        schema=ACTIVITY_SCHEMA,
    )
    cleaned = clean_activity(df)
    match, rest = split_by_event_types(cleaned, ["liked", "commented"])
    assert sorted(r.id for r in match.collect()) == ["1"]
    assert sorted(r.id for r in rest.collect()) == ["2", "3"]


def test_sliding_window_counts(spark):
    """Sliding windows: one event lands in two windows."""
    df = spark.createDataFrame(
        [("1", 1692922334000, ("liked", "u"))], schema=ACTIVITY_SCHEMA
    )
    out = flatten_window(
        windowed_counts(
            clean_activity(df), window="2 minutes", slide="1 minute", watermark=None
        )
    ).collect()
    starts = sorted(r.window_start for r in out)
    assert starts == [_utc(2023, 8, 25, 0, 11, 0), _utc(2023, 8, 25, 0, 12, 0)]
    assert all(r["count"] == 1 for r in out)


def test_parse_quarantine_splits_malformed(spark):
    """PERMISSIVE + corrupt-record: good rows parse, malformed JSON
    is quarantined with the raw payload (never dropped, never fatal —
    SURVEY.md §1.2)."""
    from spark_flink_streaming_example_with_test_spark.operators.activity import parse_activity_quarantine

    raw = spark.createDataFrame(
        [
            (b'{"id": "1", "date": 1692922325000, "event": {"event_type": "liked", "url": "u"}}',),
            (b'{"id": "2", "date": broken',),
            (b'not json at all',),
        ],
        ["value"],
    )
    good, bad = parse_activity_quarantine(raw)
    good_rows = good.collect()
    assert len(good_rows) == 1 and good_rows[0].id == "1"
    assert good_rows[0].event.event_type == "liked"
    bad_rows = sorted(r.raw for r in bad.collect())
    assert bad_rows == ['not json at all', '{"id": "2", "date": broken']
