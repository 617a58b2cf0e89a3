"""Join operators Spark lacks as primitives — currently the as-of
join (point-in-time lookup).

The reference has no joins at all (SURVEY.md §2.6), but a
point-in-time lookup is the canonical "operator the engine lacks"
(task brief): for each left row, the most recent right row with
``right.ts <= left.ts`` on the same key.

The naive formulation — range join + groupBy-max + re-join — explodes
to O(|L| x |R|) per key before aggregating. This implementation is
the scalable union-window form:

1. union the two sides with a marker column (right rows first at
   equal timestamps, so ``<=`` semantics hold),
2. one shuffle: window partitioned by key, ordered by
   (ts, marker, tiebreak),
3. ``last(right_payload, ignoreNulls=True)`` carries the latest right
   row forward onto each left row,
4. keep marker = left.

Cost at 100 TB: exactly one exchange of L+R keyed by the join key —
the same price as a single sort-merge join — with no intermediate
pair blow-up and no skew amplification beyond the key's own
frequency.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_INTERVAL_UNITS = frozenset(
    {
        "year",
        "month",
        "week",
        "day",
        "hour",
        "minute",
        "second",
        "millisecond",
        "microsecond",
    }
)


def _validate_tolerance(tolerance: str) -> None:
    """Validate an as-of tolerance INTERVAL string eagerly, so a typo
    raises a clear ValueError at plan-build time instead of a parser
    stack trace deep inside analysis.

    Accepted shape: one or more ``<number> <unit>`` pairs, e.g.
    ``"2 hours"``, ``"1 hour 30 minutes"``. Negative or zero-pair
    strings are rejected — tolerance is a magnitude.
    """
    if not isinstance(tolerance, str) or not tolerance.strip():
        raise ValueError(
            f"asof_join tolerance must be a non-empty INTERVAL string "
            f"like '2 hours', got {tolerance!r}"
        )
    toks = tolerance.strip().lower().split()
    if len(toks) % 2 != 0:
        raise ValueError(
            f"asof_join tolerance {tolerance!r} must be '<number> <unit>' "
            f"pairs, e.g. '2 hours' or '1 hour 30 minutes'"
        )
    for num, unit in zip(toks[::2], toks[1::2]):
        if not re.fullmatch(r"\d+(\.\d+)?", num):
            raise ValueError(
                f"asof_join tolerance {tolerance!r}: {num!r} is not a "
                f"non-negative number"
            )
        if unit.rstrip("s") not in _INTERVAL_UNITS:
            raise ValueError(
                f"asof_join tolerance {tolerance!r}: unknown unit {unit!r} "
                f"(expected one of {sorted(_INTERVAL_UNITS)})"
            )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: the nearest right row per key —
    ``direction="backward"`` (default) takes the most recent right
    row at-or-before the left timestamp; ``direction="forward"``
    takes the earliest right row at-or-after it (pandas
    ``merge_asof`` semantics, distributed).

    ``tolerance`` (an INTERVAL string like ``"2 hours"``) bounds how
    far the match may be from the left timestamp; out-of-tolerance
    matches count as no-match. Implemented as a post-filter on the
    carried right timestamp — the union-window plan (one exchange of
    L+R) is unchanged.

    ``right_tiebreak``: column deciding between right rows that share
    a timestamp (larger wins), making the result deterministic.
    ``how``: "inner" drops left rows with no match; "left" keeps
    them with null payload.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance is not None:
        _validate_tolerance(tolerance)
    l_cols = [c for c in left.columns if c not in (on,)]
    tb = right_tiebreak or right_payload[0]

    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tb].dataType).alias("__tb"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rt"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tb).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        F.col(right_ts).alias("__rt"),
    )

    if direction == "backward":
        # Ascending traversal: at equal timestamps rights sort before
        # lefts (<= semantics) and the largest tiebreak is traversed
        # last, so last(...) picks it.
        order = [F.asc("__t"), F.asc("__is_left"), F.asc_nulls_first("__tb")]
    else:
        # Descending traversal: the most recently traversed right at
        # each left row is the SMALLEST timestamp >= left_ts; at equal
        # timestamps the largest tiebreak is traversed last.
        order = [F.desc("__t"), F.asc("__is_left"), F.asc_nulls_first("__tb")]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_payload
        ],
        F.last("__rt", ignorenulls=True).over(w).alias("__asof_t"),
    )
    matched = F.col("__asof_t").isNotNull()
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            matched = matched & (F.col("__asof_t") >= F.col("__t") - bound)
        else:
            matched = matched & (F.col("__asof_t") <= F.col("__t") + bound)
    out = carried.filter(F.col("__is_left") == 1).select(
        F.col("__k").alias(on),
        *[F.col(c) for c in l_cols],
        *[
            F.when(matched, F.col(f"__asof_{c}")).alias(f"asof_{c}")
            for c in right_payload
        ],
        matched.alias("__matched"),
    )
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")
