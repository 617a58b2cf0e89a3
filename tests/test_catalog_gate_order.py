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


def _is_green(row: dict) -> bool:
    """Green = driver executed it without error, row counts matched,
    and — when the oracled hash/schema checks ran — those matched too
    (hash/schema may be absent for the rows-only no-oracle checks;
    present-but-False is RED: the round-8 ``lateral_column_alias_kpi``
    row had rows_match=True, hash_match=False)."""
    if row.get("err") is not None or not row.get("rows_match"):
        return False
    return row.get("hash_match", True) is not False and (
        row.get("schema_match", True) is not False
    )


def _driver_green_names() -> set[str]:
    green: set[str] = set()
    for path in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if isinstance(row, dict) and _is_green(row):
                green.add(name)
    return green


def _latest_red_names() -> set[str]:
    """Queries whose MOST RECENT driver row is red (VERDICT r08 item
    #6): a query can be ever-green yet regress later; the next gate
    run must re-check it, so it belongs inside the window too."""
    latest: dict[str, bool] = {}
    for path in sorted(
        REPO_ROOT.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(p.stem.split("_r")[1]),
    ):
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if isinstance(row, dict):
                latest[name] = _is_green(row)
    return {name for name, ok in latest.items() if not ok}


def test_correctness_history_exists():
    assert list(REPO_ROOT.glob("CORRECTNESS_r*.json")), (
        "no driver CORRECTNESS files found — guard cannot run"
    )


def test_never_verified_queries_sit_inside_gate_window():
    """When more than GATE_WINDOW queries are unverified (rounds 9+10
    added 56 new queries while the round-9 gate file never landed),
    fitting them all is impossible — the guard then degrades to 'the
    window prefix is maximally packed': no verified entry may occupy
    a slot an unverified one could use, and the overflow must be
    exactly the unavoidable n_unverified - GATE_WINDOW tail."""
    green = _driver_green_names()
    unverified = [
        (idx, spec.name)
        for idx, spec in enumerate(_SPECS)
        if spec.name not in green
    ]
    overflow = [(i, n) for i, n in unverified if i >= GATE_WINDOW]
    unavoidable = max(0, len(unverified) - GATE_WINDOW)
    # every slot inside the window must be spent on an unverified
    # query before any unverified query is allowed to overflow
    wasted = [
        (idx, spec.name)
        for idx, spec in enumerate(_SPECS[:GATE_WINDOW])
        if spec.name in green
    ] if overflow else []
    assert len(overflow) <= unavoidable and not wasted, (
        "catalog entries with no green driver row are parked behind the "
        f"~{GATE_WINDOW}-entry gate window while verified entries occupy "
        f"window slots: overflow={overflow}, wasted slots={wasted}. "
        "Move unverified entries to the front of _SPECS."
    )


def test_latest_red_queries_sit_inside_gate_window():
    """A query whose latest driver row is red must be re-gated next
    round even if it was green in some earlier round — 'never green'
    and 'latest red' coincide today, but they are different predicates
    and both must land in the window (VERDICT r08 item #6)."""
    red = _latest_red_names()
    pos = {spec.name: idx for idx, spec in enumerate(_SPECS)}
    violations = [
        (pos[name], name)
        for name in sorted(red)
        if name in pos and pos[name] >= GATE_WINDOW
    ]
    assert not violations, (
        "queries whose latest driver row is RED are parked behind the "
        f"~{GATE_WINDOW}-entry gate window: {violations}. Move them to "
        "the front of _SPECS so the next gate re-checks them."
    )


def test_no_driver_row_ever_failed_regression():
    """Any query that once had a green driver row must still be in the
    catalog (renames/drops would silently lose verified coverage)."""
    green = _driver_green_names()
    registered = {spec.name for spec in _SPECS}
    lost = sorted(green - registered)
    assert not lost, f"driver-verified queries vanished from catalog: {lost}"
