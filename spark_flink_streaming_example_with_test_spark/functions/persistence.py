"""Opt-in persist tracking for catalog-wide sweeps (VERDICT r10
stretch item #9).

Several dedup/similarity builders persist intermediate frames (the
shingle sets, the df-flagged inverted index, the capstone's shared
token frame) and deliberately do NOT unpersist them: callers compose
the returned frames lazily into larger plans, so there is no safe
release point inside the builder — the blocks are left to Spark's
LRU eviction, which is correct for the driver gate (one query per
plan) but holds ~6 users' worth of gram indexes across a 327-query
sweep in one session.

``unpersist_after`` is the sweep-side hook: builders register their
persisted frames with :func:`register` (a no-op unless a collector
is active, so query fns pay nothing in normal use), and a harness
that runs many queries sequentially wraps each one::

    with unpersist_after():
        run_query(...)   # any frames persisted inside are released
                         # once the action completes

Collectors nest (a stack): frames register with the INNERMOST active
collector only, matching the scope that will run the action. This is
deliberately session-global rather than thread-local — the sweeps
that need it are single-threaded loops, and a thread-local stack
would silently miss frames persisted on Spark's Python callback
threads.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator
from typing import TypeVar

from pyspark.sql import DataFrame

_DF = TypeVar("_DF", bound=DataFrame)

# Stack of active collectors; empty in normal (non-sweep) operation.
_ACTIVE: list[list[DataFrame]] = []


def register(df: _DF) -> _DF:
    """Record a just-persisted frame with the innermost active
    collector and return it unchanged. No-op (zero overhead beyond a
    truthiness check) when no ``unpersist_after`` scope is active."""
    if _ACTIVE:
        _ACTIVE[-1].append(df)
    return df


@contextlib.contextmanager
def unpersist_after() -> Iterator[list[DataFrame]]:
    """Release every frame persisted (and registered) inside the
    block once it exits — blocking=False, so the executors reclaim
    asynchronously and the sweep loop never stalls on cleanup.
    Yields the live collector list for tests/diagnostics."""
    frames: list[DataFrame] = []
    _ACTIVE.append(frames)
    try:
        yield frames
    finally:
        _ACTIVE.pop()
        for df in frames:
            try:
                df.unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — session may be gone
                pass
