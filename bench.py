"""Headline-query benchmark.

Runs the catalog's headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing convention (BASELINE.md): warm session — JVM startup and a
warm-up query are excluded; each query is timed end-to-end including
its parquet scan, drained with a noop write (no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _drain(df) -> None:
    """Execute the full plan without moving rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from spark_flink_streaming_example_with_test_spark.plans.catalog import HEADLINE_QUERIES, QUERIES
    from spark_flink_streaming_example_with_test_spark.session import get_session

    spark = get_session(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (BASELINE.md convention: warm session): run every
    # headline query once untimed so the timed pass measures
    # steady-state compute — not JVM startup, file-index builds, or
    # first-run whole-stage-codegen compilation.
    for warm in HEADLINE_QUERIES:
        _drain(QUERIES[warm].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        start = time.perf_counter()
        _drain(QUERIES[name].fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    # Round-over-round continuity: the headline set was extended in
    # round 8 (method comparison, bucketed range join, hybrid RRF),
    # so the grand total is not comparable to rounds 1-7 on its
    # face. legacy16_total re-sums exactly the original 16-query
    # set for direct comparison against BENCH_r01..r07.
    legacy16 = (
        "dedup_minhash_lsh", "q1_pricing_summary", "dedup_exact_docs",
        "similarity_topk_cosine", "text_quality_scores", "token_counts_top",
        "sessionize_events", "activity_windowed_count", "events_json_kpi",
        "session_windows_per_user", "q3_shipping_priority",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "topk_orders_per_customer", "asof_last_click_before_purchase",
        "q9_product_type_profit",
    )
    legacy16_total = round(
        sum(timings[q] for q in legacy16 if q in timings), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "legacy16_total": legacy16_total,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
