"""Custom sink via Spark 4's Python DataSource API: a
manifest-committing JSON-lines directory sink —
``df.write.format("manifest_jsonl")`` and
``df.writeStream.format("manifest_jsonl")`` — the pure-Python analog
of a DataSourceV2 writer with a commit protocol (SURVEY §2.1's JDBC
sink is the JVM instance of the same extension point).

Commit protocol (the point of this module — the file IO is plain
local/NFS ``open()`` here; a production build swaps in an object
store client without touching the protocol):

- every write task streams its partition to a uniquely-named
  ``data/part-<uuid>.jsonl`` and returns the filename + row count as
  its ``WriterCommitMessage``;
- nothing is visible until the DRIVER commit writes a manifest under
  ``_manifest/`` listing exactly the committed files — readers
  resolve the manifest set, so half-written task output and files
  from failed/aborted attempts are invisible garbage, never partial
  reads;
- the streaming commit keys its manifest by ``batchId`` and
  OVERWRITES it on replay: a micro-batch re-run after a crash
  re-lands its data under the same manifest, so readers see the
  batch exactly once (the orphaned files of the failed attempt stay
  unmanifested);
- ``abort`` best-effort deletes the reported task files.

Scale posture: tasks write independently (no driver data path, no
renames); the driver handles only filenames — O(tasks) metadata, the
same shape as a cloud-committer. Append-only by design: overwrite
semantics belong to a table format and are rejected loudly.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    rows: int


def _default(o):
    return str(o)


def _write_partition(path: str, iterator) -> _FileCommit:
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    fname = os.path.join(data_dir, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(fname, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=_default))
            f.write("\n")
            n += 1
    return _FileCommit(file=fname, rows=n)


def _write_manifest(path: str, name: str, messages) -> None:
    mdir = os.path.join(path, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    files = [
        {"file": m.file, "rows": m.rows} for m in messages if m is not None
    ]
    tmp = os.path.join(mdir, f".{name}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"files": files}, f)
    # Atomic publish: a manifest is either fully visible or absent.
    os.replace(tmp, os.path.join(mdir, name))


def _abort(messages) -> None:
    for m in messages or []:
        if m is not None:
            try:
                os.remove(m.file)
            except OSError:
                pass


class _ManifestBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_partition(self.path, iterator)

    def commit(self, messages):
        _write_manifest(
            self.path, f"batch-{uuid.uuid4().hex}.json", messages
        )

    def abort(self, messages):
        _abort(messages)


class _ManifestStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_partition(self.path, iterator)

    def commit(self, messages, batchId: int):
        # batchId-keyed + os.replace = idempotent on micro-batch
        # replay: the re-run's manifest supersedes the failed
        # attempt's, whose data files stay unmanifested.
        _write_manifest(self.path, f"streambatch-{batchId:020d}.json", messages)

    def abort(self, messages, batchId: int):
        _abort(messages)


class ManifestJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise ValueError(
                "manifest_jsonl is append-only: overwrite semantics need a "
                "table format; use mode('append')"
            )
        return _ManifestBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        if overwrite:
            raise ValueError("manifest_jsonl is append-only")
        return _ManifestStreamWriter(self.options)


def committed_files(path: str) -> list[str]:
    """Files published by ANY committed manifest (batch or stream) —
    the reader-side half of the protocol. Uncommitted part files are
    intentionally invisible."""
    mdir = os.path.join(path, "_manifest")
    if not os.path.isdir(mdir):
        return []
    out: list[str] = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("."):
            continue
        with open(os.path.join(mdir, name), encoding="utf-8") as f:
            out.extend(e["file"] for e in json.load(f)["files"])
    return out


def read_committed(spark, path: str, schema=None):
    """Read the committed content of a manifest_jsonl directory."""
    files = committed_files(path)
    if not files:
        raise FileNotFoundError(f"no committed manifests under {path}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(files)


def register(spark) -> None:
    spark.dataSource.register(ManifestJsonlDataSource)


class _ManifestParquetWriter(DataSourceArrowWriter):
    """Arrow fast path: each task receives pyarrow RecordBatches
    (zero per-row Python) and lands them as one parquet part file —
    the writer shape to use when the sink format speaks Arrow
    natively. Shares the manifest commit protocol with the JSONL
    form."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        fname = os.path.join(data_dir, f"part-{uuid.uuid4().hex}.parquet")
        batches = list(iterator)
        table = (
            pa.Table.from_batches(batches)
            if batches
            else None
        )
        n = 0
        if table is not None:
            pq.write_table(table, fname)
            n = table.num_rows
        else:
            # empty partition: no file, no manifest entry
            return _FileCommit(file="", rows=0)
        return _FileCommit(file=fname, rows=n)

    def commit(self, messages):
        live = [m for m in messages if m is not None and m.file]
        _write_manifest(self.path, f"batch-{uuid.uuid4().hex}.json", live)

    def abort(self, messages):
        _abort([m for m in (messages or []) if m is not None and m.file])


class _ManifestParquetStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options):
        self.path = options["path"]

    # Reuse the batch task-side logic; only the commit keying differs.
    write = _ManifestParquetWriter.write

    def commit(self, messages, batchId: int):
        live = [m for m in messages if m is not None and m.file]
        _write_manifest(self.path, f"streambatch-{batchId:020d}.json", live)

    def abort(self, messages, batchId: int):
        _abort([m for m in (messages or []) if m is not None and m.file])


class ManifestParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError("manifest_parquet is append-only")
        return _ManifestParquetWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError("manifest_parquet is append-only")
        return _ManifestParquetStreamWriter(self.options)


def read_committed_parquet(spark, path: str):
    files = committed_files(path)
    if not files:
        raise FileNotFoundError(f"no committed manifests under {path}")
    return spark.read.parquet(*files)


def register_parquet(spark) -> None:
    spark.dataSource.register(ManifestParquetDataSource)
