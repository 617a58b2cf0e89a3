"""Session factory with the engine's physical-execution defaults.

Mirrors the determinism pins of the reference's test session
(reference: spark/spark_test/spark-test.py:10-14 — local master +
UTC session timezone) and adds the scale posture SURVEY.md §4 calls
for: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for any pandas interchange, tuned shuffle
partitions, nested-schema pruning for struct columns.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs applied to sessions we did not create (e.g. the
#: driver's). All are dynamically settable SQLConf entries.
RUNTIME_CONFS: dict[str, str] = {
    # Determinism: the reference's two epoch->timestamp paths only
    # agree under UTC (reference: spark/spark_test/spark-test.py:12).
    "spark.sql.session.timeZone": "UTC",
    # The driver fixtures store events.ts as parquet TIMESTAMP(NANOS),
    # which Spark's reader rejects by default; read as int64 nanos and
    # convert explicitly (see sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Scale posture: runtime re-planning for skew and partition sizing.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched transfer for pandas UDFs / toPandas (never
    # row-at-a-time pickling).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Prune unused struct leaves at the parquet scan.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Streaming state at scale: RocksDB spills keyed state to local
    # disk instead of holding it on the JVM heap (SURVEY.md §4) —
    # a large windowed aggregation or stream-stream join otherwise
    # OOMs executors long before 100 TB.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    # RocksDB changelog checkpointing (r15): commit uploads the
    # batch's changelog instead of a full SST snapshot — the
    # documented way to cut per-batch commit latency for large state
    # at scale; locally measured neutral-to-slightly-better on the
    # bounded replays (the dominant local cost was instance count,
    # see streaming/replay.py). Snapshot maintenance still runs in
    # the background thread, so recovery cost stays bounded.
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session.

    Safe to call repeatedly; used on driver-provided sessions where
    we don't control builder config.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-settable in this build: keep going — each conf is
            # an optimization or compat knob, not a correctness gate,
            # except nanosAsLong which the loader re-checks.
            pass
    return spark


def get_session(
    app_name: str = "spark_flink_streaming_example_with_test-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or
    ``local[*]``). On a real cluster, pass ``master=None`` and let
    spark-submit own deployment; the runtime confs still apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: match parallelism; a cluster deployment would
        # size this to ~2-3x total cores or rely on AQE coalescing.
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Bound local-mode memory; harmless on a cluster where
        # spark-submit overrides it.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return apply_runtime_confs(builder.getOrCreate())
