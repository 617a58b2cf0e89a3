"""Measure the df-cap's benefit in the exact inverted-index dedup
family (VERDICT r08 item #8): candidate pairs avoided per planted hot
gram, and wall-clock with/without the cap, at replica scales.

The sf0.1 corpus has no gram anywhere near `DEFAULT_MAX_GRAM_DF`
(10k), so the cap never fires at fixture scale — which is the point
of the cap (it exists for the 100 TB boilerplate case) but means its
benefit needs a PLANTED hot gram to be measurable. This script:

1. builds N-replica copies of sf0.1 documents (same id-offset +
   vowel-permutation scheme as replica_scale_harness, so organic
   near-dup structure stays replica-local), appending a fixed
   5-token boilerplate suffix ("terms of service apply here") to
   every 5th document — 20%% of the corpus shares 3 fully-internal
   hot 3-grams;
2. computes, exactly and cheaply (one gram-frequency aggregate),
   the candidate-pair volume Σ C(df,2) with and without a cap of
   `--cap` (default 1000 — below the planted df at every replica
   scale, mimicking the 100 TB situation where boilerplate df >>
   cap);
3. times `ngram_jaccard_pairs` end-to-end (noop sink, warm) with
   max_doc_freq=None vs max_doc_freq=--cap.

Usage:
    python tools/gram_cap_benchmark.py --mults 4 8 [--cap 1000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = os.environ.get("SPARK_GRAFT_GRAM_TMP", "/tmp/gram_cap_bench")
BOILERPLATE = " terms of service apply here"
VOWELS = "aeiou"


def build(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    out = f"{BASE}/x{mult}"
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_d = docs.count()
    parts = []
    for r in range(mult):
        dst = VOWELS[r % 5:] + VOWELS[: r % 5]
        parts.append(
            docs.select(
                (F.col("doc_id") + r * n_d).alias("doc_id"),
                F.translate(F.col("text"), VOWELS, dst).alias("text"),
            )
        )
    import functools

    u = functools.reduce(lambda a, b: a.unionByName(b), parts)
    planted = u.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(BOILERPLATE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    planted.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", nargs="+", type=int, default=[4, 8])
    ap.add_argument("--cap", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_sets,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BASE, ignore_errors=True)
    try:
        for mult in args.mults:
            d = build(spark, mult)
            docs = spark.read.parquet(f"{d}/documents.parquet")
            # Exact candidate-volume accounting from gram df counts.
            inv = shingle_sets(docs, shingle_len=3).select(
                F.explode("shingles").alias("gram")
            )
            dfreq = inv.groupBy("gram").agg(F.count("*").alias("df"))
            stats = dfreq.agg(
                F.sum(F.expr("df * (df - 1) / 2")).alias("pairs_uncapped"),
                F.sum(
                    F.expr(
                        f"CASE WHEN df <= {args.cap} "
                        "THEN df * (df - 1) / 2 ELSE 0 END"
                    )
                ).alias("pairs_capped"),
                F.count_if(F.col("df") > args.cap).alias("hot_grams"),
                F.max("df").alias("max_df"),
            ).first()
            avoided = stats.pairs_uncapped - stats.pairs_capped
            per_hot = avoided / max(stats.hot_grams, 1)
            print(
                f"x{mult}: candidate pairs uncapped="
                f"{int(stats.pairs_uncapped):,} capped="
                f"{int(stats.pairs_capped):,} avoided={int(avoided):,} "
                f"hot_grams={stats.hot_grams} (max df={stats.max_df}) "
                f"avoided/hot_gram={per_hot:,.0f}",
                flush=True,
            )
            for label, cap in [("uncapped", None), ("capped", args.cap)]:
                q = ngram_jaccard_pairs(
                    docs, shingle_len=3, threshold=0.4, max_doc_freq=cap
                )
                q.write.format("noop").mode("overwrite").save()  # warm
                t0 = time.time()
                q.write.format("noop").mode("overwrite").save()
                print(
                    f"x{mult} ngram_jaccard_pairs {label}: "
                    f"{time.time() - t0:.2f}s",
                    flush=True,
                )
    finally:
        shutil.rmtree(BASE, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
