"""Engine-replayable hash-derived value helpers.

The plan modules derive deterministic buckets / uniform values /
sampling decisions from md5 hex nibbles because md5 is the one hash
both Spark and DuckDB expose with identical output — xxhash64 and
``hash()`` are engine-private and can never appear in an
oracle-checked expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_nibble(h: Column, i: int) -> Column:
    """Spark column: i-th hex char of md5 string ``h`` decoded to its
    0-15 value (digit -> ascii-48, a-f -> ascii-87). Raw-ascii
    arithmetic like (a1*256+a2) % 2^k annihilates the leading chars
    (256 % 2^k == 0 for k <= 8) — always decode nibbles before
    combining them into bucket or uniform values."""
    a = F.ascii(F.substring(h, i, 1))
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


def md5_nibble_sql(h_expr: str, i: int) -> str:
    """DuckDB twin of :func:`md5_nibble` (identical arithmetic)."""
    c = f"ASCII(SUBSTR({h_expr}, {i}, 1))"
    return f"({c} - CASE WHEN {c} >= 97 THEN 87 ELSE 48 END)"
