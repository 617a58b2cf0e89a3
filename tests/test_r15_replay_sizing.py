"""Round-15: bounded-replay state-partition sizing
(streaming/replay.py). The derived count must scale with source
bytes, never exceed the session's configured value, and the session
conf must be restored on exit — including on error."""

from __future__ import annotations

import os

import pytest

from spark_flink_streaming_example_with_test_spark.streaming.replay import (
    DEFAULT_BYTES_PER_PARTITION,
    derive_partitions,
    replay_partitions,
)

_CONF = "spark.sql.shuffle.partitions"


def test_derive_scales_with_bytes_and_clamps(spark, tmp_path):
    small = tmp_path / "small"
    small.mkdir()
    (small / "a.bin").write_bytes(b"x" * 1024)
    assert derive_partitions(spark, str(small)) == 4  # floor

    big = tmp_path / "big"
    big.mkdir()
    # 3 partitions' worth at a tiny target -> ceil, but never above
    # the session value
    (big / "a.bin").write_bytes(b"x" * 3000)
    session_n = int(spark.conf.get(_CONF))
    assert (
        derive_partitions(spark, str(big), bytes_per_partition=1000)
        == min(session_n, 4)
    )
    assert (
        derive_partitions(spark, str(big), bytes_per_partition=1)
        == session_n  # ceil saturates at the session value
    )


def test_context_sets_and_restores(spark, tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "a.bin").write_bytes(b"x" * 10)
    prev = spark.conf.get(_CONF)
    with replay_partitions(spark, str(d)) as n:
        assert spark.conf.get(_CONF) == str(n)
    assert spark.conf.get(_CONF) == prev
    with pytest.raises(RuntimeError):
        with replay_partitions(spark, str(d)):
            raise RuntimeError("boom")
    assert spark.conf.get(_CONF) == prev


def test_multiple_paths_summed(spark, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    (a / "f").write_bytes(b"x" * DEFAULT_BYTES_PER_PARTITION)
    (b / "f").write_bytes(b"x" * DEFAULT_BYTES_PER_PARTITION)
    session_n = int(spark.conf.get(_CONF))
    assert derive_partitions(spark, str(a), str(b)) == min(session_n, 4)
