"""Streaming sink adapters.

The engine's sink-extension point is ``foreachBatch`` (reference:
spark/spark_streaming.py:81-92), with one fix over the reference:
its lambda runs ``df.count()`` AND the JDBC save — two actions, so
every micro-batch plan executed twice (SURVEY.md §3.1 step 5). Our
wrapper persists the batch across its actions and unpersists after.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)

BatchWriter = Callable[[DataFrame, int], None]


def foreach_batch_sink(
    write: Callable[[DataFrame], None],
    log_counts: bool = True,
) -> BatchWriter:
    """Wrap a batch write so the micro-batch plan executes once even
    when counted for logging (persist -> actions -> unpersist)."""

    def sink(df: DataFrame, batch_id: int) -> None:
        needs_persist = log_counts
        if needs_persist:
            df.persist()
        try:
            if log_counts:
                log.info("Processing batch %s with %s rows", batch_id, df.count())
            write(df)
        finally:
            if needs_persist:
                df.unpersist()

    return sink


def jdbc_batch_writer(
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    batchsize: int = 1000,
    log_counts: bool = True,
) -> BatchWriter:
    """Per-micro-batch JDBC append (reference:
    spark/spark_streaming.py:67-78; batchsize mirrors the Flink
    twin's JdbcExecutionOptions, UserActivityFilterAgg.java:130-133).
    """

    def write(df: DataFrame) -> None:
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("user", user)
            .option("password", password)
            .option("driver", driver)
            .option("batchsize", str(batchsize))
            .mode("append")
            .save()
        )

    return foreach_batch_sink(write, log_counts=log_counts)


def parquet_batch_writer(path: str, log_counts: bool = False) -> BatchWriter:
    """Append each micro-batch to a parquet directory — the
    file-based analog used in tests and batch backfills."""

    def write(df: DataFrame) -> None:
        df.write.mode("append").parquet(path)

    return foreach_batch_sink(write, log_counts=log_counts)


def idempotent_parquet_writer(path: str) -> BatchWriter:
    """Exactly-once file sink via foreachBatch: each micro-batch
    writes to ``path/batch_id=N`` with overwrite. After a crash
    between "batch written" and "offsets committed", the replayed
    batch overwrites its own directory instead of appending
    duplicates — idempotent replay, the standard foreachBatch
    exactly-once recipe. Readers just scan ``path`` (batch_id is a
    partition column)."""

    def sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return sink


def upsert_parquet_writer(
    path: str,
    keys: list[str],
    n_buckets: int = 16,
) -> BatchWriter:
    """Keyed UPSERT (MERGE) into a bucket-partitioned parquet table —
    the foreachBatch recipe for landing an update-mode streaming
    aggregate in a plain file store (no lakehouse table format
    needed): new keys insert, existing keys are replaced by the
    batch's row.

    Mechanics per micro-batch:
    - the table is hash-partitioned on ``pmod(xxhash64(keys), n)``
      so an upsert rewrites only the buckets its keys land in, not
      the whole table (dynamic partition overwrite);
    - surviving old rows = old rows of affected buckets anti-joined
      on the key; merged = survivors + batch;
    - the merged frame is EAGERLY checkpointed before the overwrite
      — otherwise the lazy scan of the old files would race the
      overwrite of those same files (the classic self-overwrite
      trap);
    - a replayed batch (crash between write and offset commit)
      re-produces the identical merged content — the upsert is
      idempotent, giving exactly-once table state.

    At scale, bucket count spreads rewrite IO; the anti-join is
    per-affected-bucket, not per-table. Batches with duplicate keys
    keep one arbitrary row (update-mode aggregates emit one row per
    key, so this only matters for malformed inputs).
    """

    _OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"

    def sink(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = df.sparkSession
        # Dynamic overwrite only for the duration of this batch's
        # write — restore the session's prior setting afterwards so a
        # foreachBatch sink never leaks config into unrelated jobs
        # sharing the session.
        try:
            prev = spark.conf.get(_OVERWRITE_MODE)
        except Exception:
            prev = None
        spark.conf.set(_OVERWRITE_MODE, "dynamic")
        try:
            batch = df.dropDuplicates(keys).withColumn(
                "__bucket", F.pmod(F.xxhash64(*keys), n_buckets)
            )
            try:
                old = spark.read.parquet(path)
                exists = True
            except Exception:
                exists = False
            if exists:
                affected = [
                    r["__bucket"]
                    for r in batch.select("__bucket").distinct().collect()
                ]
                survivors = old.filter(old["__bucket"].isin(affected)).join(
                    batch.select(*keys), keys, "left_anti"
                )
                merged = survivors.unionByName(batch)
            else:
                merged = batch
            merged.localCheckpoint(eager=True).write.mode(
                "overwrite"
            ).partitionBy("__bucket").parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(_OVERWRITE_MODE)
            else:
                spark.conf.set(_OVERWRITE_MODE, prev)

    return sink


def jdbc_merge_writer(
    url: str,
    target: str,
    staging: str,
    key: str,
    set_cols: list[str],
    driver: str = "org.postgresql.Driver",
) -> BatchWriter:
    """Keyed UPSERT into a JDBC table — the production landing for an
    update-mode streaming aggregate in a relational store: each
    micro-batch overwrites a staging table, then one server-side
    ``MERGE INTO target USING staging`` updates matched keys and
    inserts new ones. A replayed batch merges the same rows to the
    same state, so the sink is idempotent (exactly-once table state
    under the micro-batch replay contract). ANSI MERGE runs on
    Postgres 15+, Derby 10.11+, and most warehouses unchanged.
    """

    # Spark's JDBC writer creates tables with QUOTED identifiers, so
    # they are case-sensitive lowercase in ANSI-folding databases
    # (Derby, Postgres) — the MERGE must quote them identically or
    # the parser upper-folds and misses the columns.
    def q(ident: str) -> str:
        return '"' + ident + '"'

    set_clause = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in set_cols)
    insert_cols = ", ".join(q(c) for c in [key, *set_cols])
    insert_vals = ", ".join(f"s.{q(c)}" for c in [key, *set_cols])
    # Table names stay UNQUOTED: Spark passes the dbtable string
    # through verbatim in DDL, so the created name upper-folds and an
    # unquoted reference matches it; only columns get dialect quoting.
    merge_sql = (
        f"MERGE INTO {target} t USING {staging} s "
        f"ON t.{q(key)} = s.{q(key)} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) "
        f"VALUES ({insert_vals})"
    )

    def sink(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", staging)
            .option("driver", driver)
            .option("truncate", "true")
            .mode("overwrite")
            .save()
        )
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            stmt = conn.createStatement()
            try:
                stmt.executeUpdate(merge_sql)
            finally:
                stmt.close()
        finally:
            conn.close()

    return sink
