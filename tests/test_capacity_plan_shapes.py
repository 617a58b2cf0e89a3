"""Structural plan pins for the round-13 capacity-planning batch
(VERDICT r13 item #3).

The 13 capacity/forecast queries are pre-flight sizing estimates —
their value is that they are CHEAP relative to the jobs they price
(`plans/capacity.py:9-12`: "one scan + one aggregate" per audited
table). A forecast that silently grows a second full scan of its
subject table costs more than the information is worth at 100 TB, so
this suite pins each query's executed-plan shape the same way
``test_plan_shapes.py`` pins the headline 19:

- ``CartesianProduct == 0`` (repo-wide rule — every crossJoin is a
  broadcast of a 1-row stats frame).
- Per-table textual parquet-scan counts at their designed value.
  Textual counts include broadcast/cached subtrees printed under
  each consumer, so a few queries sit legitimately above 1:
  ``join_strategy_advisor`` reads both sides of each TPC-H edge once
  per strategy leg (2 per table), ``streaming_state_sizing_plan``'s
  two state legs each print the broadcast max-timestamp subtree
  (4 textual, 1-2 runtime), ``partition_pruning_audit`` compares a
  pruned vs unpruned leg (2 by design), ``dict_compression_estimate``
  prices documents' two candidate columns separately, and
  ``dedup_spill_sizing_estimate`` prices the 3 stages of the pair
  join. Those are the designed shapes — the pin freezes them.
- ``Exchange`` upper bounds at the measured value: every extra
  Exchange is an extra shuffle of the audited table.

Counts baselined at sf0.001 AND sf0.01 (identical) on the r14 plans,
session-default AQE initial plan, cold cache.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES

# name -> (max_exchanges, {table: exact_scan_count})
CAPACITY_PINS: dict[str, tuple[int, dict[str, int]]] = {
    "shuffle_partition_plan": (1, {"events": 1}),
    "broadcast_fit_audit": (
        5,
        {"region": 1, "nation": 1, "supplier": 1, "customer": 1, "part": 1},
    ),
    "hash_partition_skew_audit": (2, {"events": 1}),
    "cache_sizing_estimate": (1, {"documents": 1}),
    "target_file_compaction_plan": (1, {"documents": 1}),
    "join_strategy_advisor": (
        17,
        {
            "region": 2, "nation": 2, "supplier": 2, "customer": 2,
            "part": 2, "orders": 2, "lineitem": 2,
        },
    ),
    "streaming_state_sizing_plan": (8, {"events": 4}),
    "partition_pruning_audit": (4, {"events": 2}),
    "dict_compression_estimate": (
        10,
        {"events": 1, "documents": 2, "orders": 1, "lineitem": 1},
    ),
    "bloom_filter_sizing": (6, {"orders": 1, "lineitem": 1, "events": 1}),
    "aqe_coalesce_estimate": (2, {"events": 1}),
    "executor_fleet_plan": (1, {"events": 1}),
    "dedup_spill_sizing_estimate": (9, {"documents": 3}),
}


@pytest.mark.parametrize("name", sorted(CAPACITY_PINS))
def test_capacity_plan_shape(spark, sf_dir, name):
    max_exchanges, scan_pins = CAPACITY_PINS[name]
    spark.catalog.clearCache()
    try:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.catalog.clearCache()

    assert txt.count("CartesianProduct") == 0, (
        f"{name}: CartesianProduct in a capacity forecast plan"
    )
    assert txt.count("Exchange") <= max_exchanges, (
        f"{name}: Exchange x{txt.count('Exchange')} > pinned "
        f"{max_exchanges} — the forecast grew an extra shuffle"
    )
    scans = Counter(re.findall(r"(\w+)\.parquet", txt))
    assert dict(scans) == scan_pins, (
        f"{name}: scan profile {dict(scans)} != pinned {scan_pins} — "
        f"a forecast must not grow a second scan of its subject table"
    )


def test_capacity_pin_table_matches_catalog():
    """Every pinned name must still be registered; a rename would
    silently drop its pin."""
    missing = [n for n in CAPACITY_PINS if n not in QUERIES]
    assert not missing, f"pinned capacity queries not in catalog: {missing}"
