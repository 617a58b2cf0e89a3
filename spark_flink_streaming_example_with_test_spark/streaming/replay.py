"""Shuffle/state-partition sizing for bounded streaming replays.

A streaming query's stateful operators create one state store
instance per shuffle partition, per operator, per micro-batch — and
the partition count is pinned into the checkpoint at query start.
Sizing it is therefore a deliberate per-query deployment decision
(the capacity model in ``plans/capacity.py`` exists to make it), not
something to inherit from the session's batch-shuffle constant:

- Too few partitions at scale: state working set per task outgrows
  executor memory / RocksDB block cache.
- Too many partitions for the input: every micro-batch pays
  (partitions x state stores per operator) instance opens, commits
  and snapshot/changelog uploads for near-empty stores. Measured in
  this sandbox (r15): a bounded 200k-row stream-stream join replay
  spends 7.4 s/pass at the session's 32 partitions and 2.2-2.6 s at
  4-8 — per-batch state-store fixed cost, not compute; AQE cannot
  coalesce stateful streaming exchanges, so the knob is the only
  lever.

:func:`replay_partitions` derives the partition count from the
replay source's actual bytes (ceil(bytes / bytes_per_partition),
floored at 4 for parallelism) and NEVER raises it above the
session's configured value — a 100 TB source saturates the ceil and
keeps the cluster-tuned setting; only bounded fixture-sized replays
shrink. The session conf is restored on exit (the value is read once
at query start, so the scope only needs to cover ``.start()``).
"""

from __future__ import annotations

import contextlib
import math
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession

_SHUFFLE_CONF = "spark.sql.shuffle.partitions"
#: Target input bytes per state partition for bounded replays. A
#: production stream sizes partitions against the capacity model's
#: state-bytes forecast; for replays of batch fixtures the source
#: size is the available proxy (state is at most proportional to it).
DEFAULT_BYTES_PER_PARTITION = 32 * 1024 * 1024
_FLOOR = 4


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def derive_partitions(
    spark: SparkSession,
    *src_paths: str,
    bytes_per_partition: int = DEFAULT_BYTES_PER_PARTITION,
) -> int:
    session_n = int(spark.conf.get(_SHUFFLE_CONF))
    total = sum(_tree_bytes(p) for p in src_paths)
    derived = max(_FLOOR, math.ceil(total / bytes_per_partition))
    return min(session_n, derived)


@contextlib.contextmanager
def replay_partitions(
    spark: SparkSession,
    *src_paths: str,
    bytes_per_partition: int = DEFAULT_BYTES_PER_PARTITION,
) -> Iterator[int]:
    """Scope ``spark.sql.shuffle.partitions`` to a size derived from
    the replay source's bytes; restore the session value on exit.
    Results are partition-count independent (keyed state and
    aggregates do not depend on how keys shard); only the per-batch
    state-store instance count changes."""
    prev = spark.conf.get(_SHUFFLE_CONF)
    n = derive_partitions(
        spark, *src_paths, bytes_per_partition=bytes_per_partition
    )
    spark.conf.set(_SHUFFLE_CONF, str(n))
    try:
        yield n
    finally:
        spark.conf.set(_SHUFFLE_CONF, prev)
