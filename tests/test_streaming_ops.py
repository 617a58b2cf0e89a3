"""Micro-batch tests for the streaming-only operators: watermarked
dedup, stream-stream interval join, applyInPandasWithState running
totals. File sources stand in for Kafka (one file = one micro-batch
via maxFilesPerTrigger)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spark_flink_streaming_example_with_test_spark.streaming.ops import (
    dedup_within_watermark,
    interval_join_streams,
    running_user_totals,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _line(eid: int, uid: int, ts: str, etype: str = "click", value: float = 1.0) -> str:
    return json.dumps(
        {"event_id": eid, "user_id": uid, "ts": ts, "event_type": etype, "value": value}
    )


def _write_file(dirpath: str, name: str, lines: list[str]) -> None:
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _file_stream(spark, path: str):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )


def _run_collecting(transformed, ckpt: str, output_mode: str = "append"):
    emitted: list = []

    def collect(df, batch_id):
        emitted.extend(df.collect())

    query = (
        transformed.writeStream.foreachBatch(collect)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    return query, emitted


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    stream = dedup_within_watermark(
        _file_stream(spark, str(src)), keys=["event_id"], ts_col="ts", delay="10 minutes"
    )
    query, emitted = _run_collecting(stream, str(tmp_path / "ckpt"))
    try:
        _write_file(str(src), "f1.json", [
            _line(1, 1, "2024-01-01 10:00:00"),
            _line(1, 1, "2024-01-01 10:00:01"),  # same-batch duplicate
            _line(2, 1, "2024-01-01 10:00:02"),
        ])
        query.processAllAvailable()
        # cross-batch duplicate inside the watermark horizon
        _write_file(str(src), "f2.json", [
            _line(1, 1, "2024-01-01 10:00:05"),
            _line(3, 2, "2024-01-01 10:00:06"),
        ])
        query.processAllAvailable()
    finally:
        query.stop()
    assert sorted(r.event_id for r in emitted) == [1, 2, 3]


def test_stream_stream_interval_join(spark, tmp_path):
    imps_dir, clicks_dir = tmp_path / "imps", tmp_path / "clicks"
    imps_dir.mkdir()
    clicks_dir.mkdir()

    imps = _file_stream(spark, str(imps_dir)).selectExpr(
        "event_id AS imp_id", "user_id", "ts AS imp_ts"
    )
    clicks = _file_stream(spark, str(clicks_dir)).selectExpr(
        "event_id AS click_id", "user_id", "ts AS click_ts"
    )
    joined = interval_join_streams(
        imps, clicks, key="user_id", left_ts="imp_ts", right_ts="click_ts",
        within="1 minute", watermark="2 minutes",
    )
    query, emitted = _run_collecting(joined, str(tmp_path / "ckpt"))
    try:
        _write_file(str(imps_dir), "i1.json", [
            _line(10, 1, "2024-01-01 10:00:00"),
            _line(11, 2, "2024-01-01 10:00:00"),
        ])
        _write_file(str(clicks_dir), "c1.json", [
            _line(20, 1, "2024-01-01 10:00:30"),  # within 1 min of imp 10
            _line(21, 1, "2024-01-01 10:02:00"),  # too late for imp 10
            _line(22, 3, "2024-01-01 10:00:10"),  # no impression for user 3
        ])
        query.processAllAvailable()
        query.processAllAvailable()
    finally:
        query.stop()
    pairs = sorted((r.imp_id, r.click_id) for r in emitted)
    assert pairs == [(10, 20)]


def test_running_user_totals_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    stream = running_user_totals(_file_stream(spark, str(src)))
    query, emitted = _run_collecting(stream, str(tmp_path / "ckpt"), output_mode="update")
    try:
        _write_file(str(src), "f1.json", [
            _line(1, 1, "2024-01-01 10:00:00", value=1.0),
            _line(2, 1, "2024-01-01 10:00:01", value=2.0),
            _line(3, 2, "2024-01-01 10:00:02", value=5.0),
        ])
        query.processAllAvailable()
        _write_file(str(src), "f2.json", [
            _line(4, 1, "2024-01-01 10:00:10", value=4.0),
        ])
        query.processAllAvailable()
    finally:
        query.stop()
    by_batch = {(r.user_id, r.n_events): r.total_value for r in emitted}
    # batch 1 snapshots
    assert by_batch[(1, 2)] == pytest.approx(3.0)
    assert by_batch[(2, 1)] == pytest.approx(5.0)
    # batch 2: user 1 state carried forward
    assert by_batch[(1, 3)] == pytest.approx(7.0)


def test_idempotent_writer_replay_no_duplicates(spark, tmp_path):
    """Replaying a batch (crash-recovery scenario) must overwrite its
    own batch directory, not append duplicates."""
    from spark_flink_streaming_example_with_test_spark.streaming.sinks import idempotent_parquet_writer

    out = str(tmp_path / "out")
    sink = idempotent_parquet_writer(out)
    batch = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    sink(batch, 0)
    sink(batch, 0)  # replay of the same batch id
    sink(batch, 1)
    back = spark.read.parquet(out)
    assert back.count() == 20  # 10 per distinct batch, replay absorbed
    assert sorted(r.batch_id for r in back.select("batch_id").distinct().collect()) == [0, 1]


def test_available_now_backfill_processes_everything_and_stops(spark, tmp_path):
    from spark_flink_streaming_example_with_test_spark.streaming.job import start_backfill

    src = tmp_path / "src"
    src.mkdir()
    _write_file(str(src), "f1.json", [_line(i, 1, "2024-01-01 10:00:00") for i in range(5)])
    _write_file(str(src), "f2.json", [_line(i, 2, "2024-01-01 10:01:00") for i in range(5, 8)])
    collected: list = []
    q = start_backfill(
        _file_stream(spark, str(src)),
        transform=lambda df: df.select("event_id", "user_id"),
        sink=lambda df, bid: collected.extend(df.collect()),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    assert not q.isActive  # availableNow stops by itself
    assert sorted(r.event_id for r in collected) == list(range(8))


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_running_stats_matches_batch(spark, tmp_path):
    """transformWithStateInPandas twin of the running-totals
    operator, checked against batch aggregation. Skips where the TWS
    streaming runner's protobuf dependency is absent (this sandbox);
    runs for real in a full deployment. Env re-probed at round starts
    (r7: absent; r8: absent; r9 2026-08-14: absent)."""
    import pytest

    if not _protobuf_available():
        pytest.skip("google.protobuf unavailable: TWS runner cannot start")

    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.streaming.ops import running_user_stats_tws

    src = str(tmp_path / "tws_src")
    rows = [(uid, float(v)) for uid in range(5) for v in range(uid + 1)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    q = (
        running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_unit")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in spark.table("tws_unit").collect()
    }
    expect = {
        r.user_id: (r.n, r.total, r.vmax)
        for r in df.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert got == expect


def test_interval_join_full_outer_rejects_overlapping_columns(spark):
    """full_outer coalesces the key and emits qualified non-key
    columns; a shared non-key name must fail eagerly with a clear
    ValueError, not later with an ambiguous-reference analysis
    error."""
    import pytest

    from spark_flink_streaming_example_with_test_spark.streaming.ops import interval_join_streams

    left = spark.createDataFrame([], "k long, a_ts timestamp, amount double")
    right = spark.createDataFrame([], "k long, b_ts timestamp, amount double")
    with pytest.raises(ValueError, match="amount"):
        interval_join_streams(
            left, right, key="k", left_ts="a_ts", right_ts="b_ts",
            how="full_outer",
        )


def test_streaming_funnel_state_converges_across_batch_splits(spark, tmp_path):
    """The user-journey funnel state must converge to the batch
    first-touch answer even when a user's steps arrive OUT OF ORDER
    across micro-batches: user 1's click lands in batch 1, the
    earlier view only in batch 2 — the conversion flag flips from
    false to true, which only the final (max-version) state row may
    decide. Also pins that multiple micro-batches really ran (the
    version counter exceeds 1 for the split user)."""
    import uuid

    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.streaming.ops import streaming_funnel_state

    src = tmp_path / "funnel_src"
    src.mkdir()
    # batch 1: user 1 clicks at t=200; user 2 full journey in order
    b1 = spark.createDataFrame(
        [(1, "click", 200), (2, "view", 10), (2, "click", 20),
         (2, "purchase", 30)],
        "user_id long, event_type string, us long",
    )
    # batch 2: user 1's earlier view at t=100 arrives late -> converts
    b2 = spark.createDataFrame(
        [(1, "view", 100)], "user_id long, event_type string, us long"
    )
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema("user_id long, event_type string, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    sink = f"funnel_t_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_funnel_state(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = {
        r["user_id"]: r
        for r in spark.table(sink)
        .groupBy("user_id")
        .agg(F.max(F.struct("version", "t1", "t2", "t3")).alias("s"))
        .select("user_id", "s.*")
        .collect()
    }
    u1, u2 = final[1], final[2]
    assert u1["version"] >= 2  # user 1's state spanned >= 2 batches
    assert (u1["t1"], u1["t2"], u1["t3"]) == (100, 200, None)
    assert u1["t2"] > u1["t1"]  # late view flipped the conversion
    assert (u2["t1"], u2["t2"], u2["t3"]) == (10, 20, 30)


def test_session_timeout_closes_by_gap_and_by_timer(spark, tmp_path):
    """Both closure paths of the event-time-timeout sessionizer:
    user 1's first session closes when a successor event past the
    30-min gap ARRIVES (emitted in that data batch); user 2's only
    session closes via the EVENT-TIME TIMER once the watermark
    (max_ts - 10 s, advanced by batch 2's data and applied in the
    trailing no-data micro-batch) passes its gap horizon. User 1's
    final session stays captive — its horizon is above the final
    watermark."""
    import uuid

    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.streaming.ops import (
        sessionize_with_event_time_timeout,
    )

    h = 3_600_000_000  # 1h in micros
    # batch 1 (t ~ hour 0): u1 two events 10 min apart; u2 one event
    b1 = [(1, h), (1, h + 600_000_000), (2, h + 1)]
    # batch 2 (t ~ hour 3): u1 reopens (gap closure of session 1);
    # max ts pushes the final watermark far past u2's horizon
    b2 = [(1, 4 * h)]
    src = tmp_path / "sess_src"
    src.mkdir()
    for i, rows in enumerate((b1, b2), start=1):
        spark.createDataFrame(
            [(u, us) for u, us in rows], "user_id long, us long"
        ).select(
            "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "us"
        ).coalesce(1).write.parquet(str(src / f"f{i}"))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
        .withWatermark("ts", "10 seconds")
    )
    sink = f"sess_t_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_with_event_time_timeout(stream)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["user_id"], r["session_start"]): r
        for r in spark.table(sink).collect()
    }
    # u1 session 1: closed by the gap successor, both events counted
    assert rows[(1, h)]["n_events"] == 2
    assert rows[(1, h)]["session_end"] == h + 600_000_000
    # u2: closed by the event-time timer in the no-data batch
    assert rows[(2, h + 1)]["n_events"] == 1
    # u1's reopened session is captive (horizon above final watermark)
    assert (1, 4 * h) not in rows
    assert len(rows) == 2
