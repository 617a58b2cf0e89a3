"""True micro-batch streaming tests — the Spark analog of the
reference's MiniCluster integration test (FlinkTest.java:100-186):
bounded file source standing in for Kafka, real watermark/append
semantics that the batch path can't see (late-row dropping,
exactly-once window emission), stream splitting, checkpoint restart.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from spark_flink_streaming_example_with_test_spark.operators.activity import flagship_pipeline
from spark_flink_streaming_example_with_test_spark.streaming.sinks import parquet_batch_writer
from spark_flink_streaming_example_with_test_spark.streaming.job import (
    read_activity_file_stream,
    start_pipeline,
    start_split_pipelines,
)

# Base minute M = 2023-08-25 00:12:00 UTC.
M = 1692922320000


def _event(uid: str, offset_ms: int, etype: str) -> str:
    return json.dumps(
        {
            "id": uid,
            "date": M + offset_ms,
            "event": {"event_type": etype, "url": "u"},
        }
    )


def _write_file(dirpath: str, name: str, lines: list[str]) -> None:
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_append_mode_window_emission_and_late_drop(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    emitted: list[tuple[int, list]] = []

    def collect(df, batch_id):
        rows = df.collect()
        if rows:
            emitted.append((batch_id, rows))

    stream = read_activity_file_stream(spark, str(src))
    query = start_pipeline(
        stream,
        flagship_pipeline,
        collect,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        # Batch 1: three events inside window M (user 1).
        _write_file(str(src), "f1.json", [
            _event("1", 5_000, "liked"),
            _event("1", 20_000, "LIKED"),
            _event("1", 30_000, "commented"),
        ])
        query.processAllAvailable()
        assert emitted == []  # window M not finalized yet

        # Batch 2: event at M+2min raises max event time; watermark
        # (updated at batch end) passes M+1min for the NEXT batch.
        _write_file(str(src), "f2.json", [_event("2", 120_000, "liked")])
        query.processAllAvailable()

        # Batch 3: event at M+4min triggers emission of window M.
        _write_file(str(src), "f3.json", [_event("2", 240_000, "liked")])
        query.processAllAvailable()
        flat = [r for _, rows in emitted for r in rows]
        win_m = [r for r in flat if r.window_start.minute == 12]
        assert {(r.id, r.event_type, r["count"]) for r in win_m} == {
            ("1", "liked", 2),
            ("1", "commented", 1),
        }

        # Batch 4: LATE row back in window M — beyond the watermark,
        # must be dropped from state, never re-emitting window M.
        n_before = len([r for _, rows in emitted for r in rows])
        _write_file(str(src), "f4.json", [_event("1", 10_000, "liked")])
        query.processAllAvailable()
        _write_file(str(src), "f5.json", [_event("2", 600_000, "liked")])
        query.processAllAvailable()
        flat = [r for _, rows in emitted for r in rows]
        win_m_after = [r for r in flat if r.window_start.minute == 12]
        assert len(win_m_after) == len(win_m)  # late row had no effect
    finally:
        query.stop()


def test_stream_split_partitions_input(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")

    from spark_flink_streaming_example_with_test_spark.operators.activity import (
        clean_activity,
        split_by_event_types,
    )

    def branch_keep(df):
        return split_by_event_types(clean_activity(df), ["liked", "commented"])[0]

    def branch_rest(df):
        return split_by_event_types(clean_activity(df), ["liked", "commented"])[1]

    stream = read_activity_file_stream(spark, str(src))
    queries = start_split_pipelines(
        stream,
        [
            ("kept", branch_keep, parquet_batch_writer(out_a)),
            ("rest", branch_rest, parquet_batch_writer(out_b)),
        ],
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    try:
        _write_file(str(src), "f1.json", [
            _event("1", 1_000, "liked"),
            _event("2", 2_000, "viewed"),
            _event("3", 3_000, "bookmarked"),
            _event("4", 4_000, "Commented"),
        ])
        for q in queries:
            q.processAllAvailable()
        kept = {r.id for r in spark.read.parquet(out_a).collect()}
        rest = {r.id for r in spark.read.parquet(out_b).collect()}
        assert kept == {"1", "4"}
        assert rest == {"2", "3"}
    finally:
        for q in queries:
            q.stop()


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    from spark_flink_streaming_example_with_test_spark.operators.activity import (
        clean_activity,
        filter_event_types,
    )

    def passthrough(df):
        return filter_event_types(clean_activity(df), ["liked", "bookmarked", "commented"])

    def run_until_drained():
        stream = read_activity_file_stream(spark, str(src))
        q = start_pipeline(stream, passthrough, parquet_batch_writer(out), ckpt)
        q.processAllAvailable()
        q.stop()

    _write_file(str(src), "f1.json", [_event("1", 1_000, "liked")])
    run_until_drained()
    # Restart from the same checkpoint with one more file: the first
    # file's offsets are committed -> exactly-once output.
    _write_file(str(src), "f2.json", [_event("2", 2_000, "bookmarked")])
    run_until_drained()

    rows = spark.read.parquet(out).collect()
    assert sorted(r.id for r in rows) == ["1", "2"]


def test_pipeline_trigger_processing_time(spark, tmp_path):
    """The processing_time knob (micro-batch analog of the
    reference's 20 ms JDBC flush interval) is actually wired into
    the writer: a valid interval runs end to end, an invalid one is
    rejected at start — proving the option reaches .trigger() rather
    than being silently dropped."""
    src = tmp_path / "src_trig"
    src.mkdir()
    emitted = []

    def collect(df, batch_id):
        rows = df.collect()
        if rows:
            emitted.append(rows)

    stream = read_activity_file_stream(spark, str(src))
    query = start_pipeline(
        stream,
        flagship_pipeline,
        collect,
        checkpoint_dir=str(tmp_path / "ckpt_trig"),
        processing_time="100 milliseconds",
    )
    try:
        _write_file(str(src), "f1.json", [
            _event("1", 5_000, "liked"),
            _event("2", 120_000, "liked"),
            _event("2", 240_000, "liked"),
        ])
        query.processAllAvailable()
        # Window M finalized once the watermark passed it.
        _write_file(str(src), "f2.json", [_event("2", 600_000, "liked")])
        query.processAllAvailable()
        flat = [r for rows in emitted for r in rows]
        assert any(r["count"] == 1 and r.id == "1" for r in flat)
    finally:
        query.stop()

    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)invalid|pars"):
        start_pipeline(
            stream,
            flagship_pipeline,
            collect,
            checkpoint_dir=str(tmp_path / "ckpt_trig2"),
            processing_time="not-a-duration",
        )


def test_upsert_sink_keyed_merge(spark, tmp_path):
    """upsert_parquet_writer lands an update-mode aggregate as a
    keyed table: second batch replaces existing keys and inserts new
    ones; replaying a batch leaves the table unchanged (idempotent
    exactly-once state)."""
    from spark_flink_streaming_example_with_test_spark.streaming.sinks import upsert_parquet_writer

    out = str(tmp_path / "upsert_out")
    sink = upsert_parquet_writer(out, keys=["user_id"], n_buckets=4)

    b0 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "user_id long, total double"
    )
    sink(b0, 0)
    b1 = spark.createDataFrame(
        [(2, 25.0), (3, 30.0)], "user_id long, total double"
    )
    sink(b1, 1)

    def table():
        return {
            r.user_id: r.total
            for r in spark.read.parquet(out).select("user_id", "total").collect()
        }

    assert table() == {1: 10.0, 2: 25.0, 3: 30.0}
    sink(b1, 1)  # crash-replay of the same batch
    assert table() == {1: 10.0, 2: 25.0, 3: 30.0}


def test_upsert_sink_end_to_end_stream(spark, tmp_path):
    """Full streaming path: update-mode running totals land via the
    upsert sink; the final table equals the batch aggregate."""
    import pyspark.sql.functions as F

    from spark_flink_streaming_example_with_test_spark.streaming.ops import running_user_totals
    from spark_flink_streaming_example_with_test_spark.streaming.sinks import upsert_parquet_writer

    src = str(tmp_path / "upsert_src")
    out = str(tmp_path / "upsert_table")
    rows = [(uid, float(v)) for uid in range(4) for v in range(uid + 2)]
    data = spark.createDataFrame(rows, "user_id long, value double")
    data.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(upsert_parquet_writer(out, keys=["user_id"]))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "upsert_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.read.parquet(out)
        .select("user_id", "n_events", "total_value")
        .collect()
    }
    expect = {
        r.user_id: (r.n, r.total)
        for r in data.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == expect


def test_state_metadata_reader_describes_operator(spark, tmp_path):
    """spark.read.format('state-metadata') must describe the
    stateful operator of a finished checkpoint — the first stop when
    debugging state-size incidents."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:30")], "user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    q = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "10 seconds")
        .groupBy("user_id", F.window("ts", "1 minute"))
        .count()
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    meta = spark.read.format("state-metadata").load(ckpt).collect()
    assert len(meta) == 1
    assert meta[0].operatorName == "stateStoreSave"
    assert meta[0].numPartitions == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert meta[0].maxBatchId >= 0


def test_chained_windows_multibatch_matches_single_batch(spark, tmp_path):
    """The chained two-level windowed aggregation must produce the
    SAME emitted set whether the replay arrives as one batch or as
    many (maxFilesPerTrigger=1 forces per-file micro-batches, so the
    watermark advances mid-stream and level-1 flushes incrementally
    feed level 2 across batches — the production arrival pattern,
    vs the catalog query's single-batch replay)."""
    import uuid

    from pyspark.sql.window import Window

    from spark_flink_streaming_example_with_test_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    events = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts")
        .orderBy("ts")
    )
    src = str(tmp_path / "src")
    # Time-ordered 4-file layout: each file is a contiguous time
    # slice, so per-file batches advance the watermark monotonically
    # (random slicing would just drop cross-file stragglers and make
    # the comparison about late-drop, not the cascade).
    events.withColumn(
        "slice", F.ntile(4).over(Window.orderBy("ts"))
    ).write.mode("overwrite").partitionBy("slice").parquet(src)

    def run(max_files: int | None):
        sink = f"mb_{uuid.uuid4().hex[:8]}"
        reader = spark.readStream.schema("user_id long, ts timestamp")
        if max_files is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files))
        stream = reader.parquet(src)
        lvl1 = (
            stream.withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "5 minutes"), "user_id")
            .agg(F.count("*").alias("cnt"))
        )
        lvl2 = (
            lvl1.groupBy(
                F.window(F.window_time("window"), "15 minutes").alias("w15")
            )
            .agg(
                F.count("*").alias("auw"),
                F.sum("cnt").cast("long").alias("n"),
            )
            .select(F.col("w15.start").alias("w_start"), "auw", "n")
        )
        q = (
            lvl2.writeStream.format("memory")
            .queryName(sink).outputMode("append").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            (str(r.w_start), r.auw, r.n) for r in spark.table(sink).collect()
        }

    single = run(None)
    multi = run(1)
    # Multi-batch emission reaches at least as far as single-batch
    # (same final watermark => same closed-window set), and never
    # emits a window the single-batch run disagrees with.
    assert multi == single
