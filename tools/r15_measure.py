"""Round-15 measurement harness.

Modes:
  construction  — time fn(spark, sf_dir) alone (driver-side build cost)
                  for the headline queries, 3 reps each.
  sweep         — time fn + noop drain for a named subset of catalog
                  queries (default: streaming_* + graph-family), warm
                  (one untimed pass then a timed pass), unpersist_after
                  each.
  phases        — phase breakdown of one streaming e2e replay.

Usage:
  python tools/r15_measure.py construction
  python tools/r15_measure.py sweep streaming_
  python tools/r15_measure.py sweep <exact_name> ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1]
    from spark_flink_streaming_example_with_test_spark.functions.persistence import unpersist_after
    from spark_flink_streaming_example_with_test_spark.plans.catalog import HEADLINE_QUERIES, QUERIES
    from spark_flink_streaming_example_with_test_spark.session import get_session

    spark = get_session(app_name="r15-measure")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "construction":
        # Warm the session + plan cache first.
        for name in HEADLINE_QUERIES:
            QUERIES[name].fn(spark, SF_DIR)
        out = {}
        for name in HEADLINE_QUERIES:
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, SF_DIR)
                reps.append(round(time.perf_counter() - t0, 4))
            out[name] = min(reps)
        total = round(sum(out.values()), 3)
        print(json.dumps({"construction_min_sec": out, "total": total}))
    elif mode == "sweep":
        pats = sys.argv[2:] or ["streaming_"]
        names = [
            n for n in QUERIES
            if any(n == p or (p.endswith("_") and n.startswith(p)) or p in n
                   for p in pats)
        ]
        out = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"r15sweep:{name}")
            try:
                with unpersist_after():
                    _drain(QUERIES[name].fn(spark, SF_DIR))  # warm
                t0 = time.perf_counter()
                with unpersist_after():
                    _drain(QUERIES[name].fn(spark, SF_DIR))
                out[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                out[name] = f"ERR: {e}"[:120]
            spark.catalog.clearCache()
        total = round(sum(v for v in out.values() if isinstance(v, float)), 3)
        print(json.dumps({"sweep_sec": out, "total": total}, indent=1))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
