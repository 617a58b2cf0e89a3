"""Per-query wall-time budgets for the most expensive headline
queries, pinned at sf0.01 (the driver's correctness-gate scale).

Caps are ~15-30x the measured warm times, so sandbox load can't flap
them — the target is CATASTROPHIC regressions (an accidental cross
join, a lost broadcast, a persist dropped from a multi-consumer
pipeline), which show up as 100x blowups, not 2x drift. Plan-shape
regressions below that threshold are caught structurally by
tests/test_plans.py; absolute drift is tracked round-over-round by
the driver's BENCH_r{N}.json.
"""

from __future__ import annotations

import time

import pytest

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.01"

#: (query name, per-query cap in seconds at sf0.01, local[32] warm-ish)
BUDGETS = [
    ("dedup_minhash_lsh", 30.0),  # now also computes the exact-verify set
    ("similarity_topk_cosine", 15.0),
    ("q9_product_type_profit", 15.0),
    ("q5_local_supplier_volume", 15.0),
    ("q3_shipping_priority", 15.0),
    # Round-5 additions (verdict r02 #6 / r03 #4 / r04 #4): the four
    # headline queries whose round-over-round swings were pure
    # sandbox noise — pinned so a real regression is attributable.
    ("q1_pricing_summary", 10.0),
    ("events_json_kpi", 10.0),
    ("activity_windowed_count", 10.0),
    ("token_counts_top", 10.0),
    # Round-7 additions: the heaviest new gate-window queries (the
    # inverted-index + connected-components composites). Warm sf0.01
    # times are ~1-3 s; caps at the same catastrophic-only altitude.
    # (raised 30 -> 60 in round 8: the df-cap guard moved the warm
    # sf0.01 time to ~8-11 s across the six-detector ladder; the cap
    # stays catastrophic-only, not drift-sensitive)
    ("dedup_method_comparison", 60.0),
    ("curation_pipeline_capstone", 30.0),
    ("dedup_keep_best_canonical", 30.0),
    # Round-8 additions (verdict r07 item #6): the two newly-headlined
    # round-6/7 operators without a pin yet. Warm sf0.01 times are
    # well under 2 s; same catastrophic-only altitude.
    ("range_join_bucketed", 15.0),
    ("hybrid_search_rrf", 15.0),
    # Round-8: the exact gram family's cost profile changed with the
    # df-cap guard (window + persisted flagged index) — pin the two
    # direct family members so a cap-related blowup is attributable.
    ("dedup_ngram_jaccard", 20.0),
    ("dedup_containment_ngrams", 20.0),
    ("kcore_decomposition", 15.0),
]


def _drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


@pytest.mark.parametrize("name,budget", BUDGETS, ids=[b[0] for b in BUDGETS])
def test_headline_query_within_budget(spark, name, budget):
    fn = QUERIES[name].fn
    # Warm once: exclude first-run codegen compilation and file
    # listing, matching bench.py's warm-session convention.
    _drain(fn(spark, SF_DIR))
    start = time.perf_counter()
    _drain(fn(spark, SF_DIR))
    elapsed = time.perf_counter() - start
    assert elapsed < budget, (
        f"{name} took {elapsed:.1f}s at sf0.01 — over the {budget}s "
        "catastrophic-regression budget (expected well under a few "
        "seconds warm)"
    )
