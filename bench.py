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
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
