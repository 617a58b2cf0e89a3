"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on by default in the session factory)
handles most skew at runtime by splitting oversized partitions of a
sort-merge join. Salting is the explicit fallback for the cases AQE
can't fix — e.g. a broadcast-ineligible dimension joined on a key
where one value is 30% of the fact table, or a streaming join where
AQE doesn't apply.

Mechanics: the big side gets a uniform salt in [0, n); the small side
is replicated n times (one copy per salt value); the join key becomes
(key, salt). The hot key's rows now spread over n reducer partitions
instead of one. Cost: small side inflates n-fold — keep n modest
(8-32) and the small side actually small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Uniform salt in [0, n_salts). ``rand(seed)`` is deterministic
    per partition+row-offset, so re-running the same plan salts
    identically (required for the driver's determinism checks)."""
    return df.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salts).cast("int")
    )


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Small-side replication: one copy of every row per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread over
    ``n_salts`` partitions. Semantically identical to
    ``big.join(small, on, how)`` for inner/left joins (each big row
    meets exactly one copy of each matching small row). Other join
    types are rejected: right/full/semi/anti would emit the
    replicated small-side rows n_salts times (or misfilter on the
    salt column) instead of matching the unsalted join."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join only preserves inner/left semantics, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, n_salts, seed)
    s = replicate_for_salt(small, n_salts)
    return b.join(s, [*keys, SALT_COL], how).drop(SALT_COL)
