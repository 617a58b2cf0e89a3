"""Gate-ordering guard (VERDICT r07 item #1).

The round driver's correctness gate consumes a bounded prefix of
``plans/catalog.py:_SPECS`` (~50 entries per round). Rounds 6 and 7
both appended new queries BEHIND that window, leaving them without a
driver-verified CORRECTNESS row for a full round. This test makes the
fix structural: union the green keys from every ``CORRECTNESS_r*.json``
the driver has recorded, and assert every catalog entry that has never
received a green driver row sits inside the first ``GATE_WINDOW``
positions — i.e. the next gate run will check it.

Reverting the round-8 reorder (or appending a new query at the tail)
makes this fail immediately.
"""

from __future__ import annotations

import json
from pathlib import Path

from spark_flink_streaming_example_with_test_spark.plans.catalog import _SPECS

REPO_ROOT = Path(__file__).resolve().parents[1]

# The driver's documented gate prefix size. If the driver ever widens
# the window this constant can follow; keeping it conservative means
# the guard errs toward over-prioritizing unverified queries.
GATE_WINDOW = 50


def _driver_green_names() -> set[str]:
    green: set[str] = set()
    for path in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # Green = driver executed it without error and the row
            # counts matched (hash/schema may be absent for the
            # rows-only no-oracle checks).
            if row.get("err") is None and row.get("rows_match"):
                green.add(name)
    return green


def test_correctness_history_exists():
    assert list(REPO_ROOT.glob("CORRECTNESS_r*.json")), (
        "no driver CORRECTNESS files found — guard cannot run"
    )


def test_never_verified_queries_sit_inside_gate_window():
    green = _driver_green_names()
    violations = [
        (idx, spec.name)
        for idx, spec in enumerate(_SPECS)
        if spec.name not in green and idx >= GATE_WINDOW
    ]
    assert not violations, (
        "catalog entries with no green driver row are parked behind the "
        f"~{GATE_WINDOW}-entry gate window and will miss the next gate: "
        f"{violations}. Move them to the front of _SPECS."
    )


def test_no_driver_row_ever_failed_regression():
    """Any query that once had a green driver row must still be in the
    catalog (renames/drops would silently lose verified coverage)."""
    green = _driver_green_names()
    registered = {spec.name for spec in _SPECS}
    lost = sorted(green - registered)
    assert not lost, f"driver-verified queries vanished from catalog: {lost}"
