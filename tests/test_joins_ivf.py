"""Behavioral tests for the as-of join (union-window form) and the
IVF approximate top-k: edge semantics the oracle-parity gate can't
isolate — ties, missing-prior rows, left-vs-inner, and IVF recall
against the exact scan."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spark_flink_streaming_example_with_test_spark.operators.joins import asof_join
from spark_flink_streaming_example_with_test_spark.operators.similarity import cosine_topk, ivf_topk


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:05"), 100.0),  # after q2
            (1, _ts("2024-01-01 10:00:00"), 101.0),  # exactly at q2 (<= hit)
            (1, _ts("2024-01-01 09:00:00"), 102.0),  # before any quote
            (2, _ts("2024-01-01 10:00:10"), 200.0),  # user with one quote
            (3, _ts("2024-01-01 10:00:00"), 300.0),  # user with no quotes
        ],
        ["uid", "t_ts", "price"],
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:00"), 10),
            (1, _ts("2024-01-01 10:00:00"), 11),  # tie on ts with quote 12
            (1, _ts("2024-01-01 10:00:00"), 12),  # higher id wins the tie
            (2, _ts("2024-01-01 10:00:01"), 20),
        ],
        ["uid", "q_ts", "qid"],
    )
    return trades, quotes


def test_asof_inner_matches_latest_at_or_before(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="uid", left_ts="t_ts", right_ts="q_ts",
        right_payload=["qid", "q_ts"], right_tiebreak="qid", how="inner",
    )
    got = {(r.uid, r.t_ts.isoformat(sep=" "), r.asof_qid) for r in out.collect()}
    assert got == {
        (1, "2024-01-01 10:00:05", 12),  # latest quote ts=10:00, tie -> qid 12
        (1, "2024-01-01 10:00:00", 12),  # <= includes equal timestamp
        (2, "2024-01-01 10:00:10", 20),
    }


def test_asof_left_keeps_unmatched(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="uid", left_ts="t_ts", right_ts="q_ts",
        right_payload=["qid"], right_tiebreak="qid", how="left",
    )
    rows = {(r.uid, r.t_ts.isoformat(sep=" ")): r.asof_qid for r in out.collect()}
    assert len(rows) == 5
    assert rows[(1, "2024-01-01 09:00:00")] is None  # before any quote
    assert rows[(3, "2024-01-01 10:00:00")] is None  # keyless user kept


def test_asof_preserves_left_payload(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="uid", left_ts="t_ts", right_ts="q_ts",
        right_payload=["qid"], right_tiebreak="qid", how="inner",
    )
    prices = {r.price for r in out.collect()}
    assert prices == {100.0, 101.0, 200.0}


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """Three well-separated clusters; centroid stand-ins are ids 0-2."""
    import random

    rng = random.Random(7)
    base = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0]}
    rows = []
    for vid in range(60):
        c = base[vid % 3]
        rows.append((vid, [x + rng.uniform(-0.5, 0.5) for x in c]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_ivf_recall_on_clustered_data(clustered_vectors):
    """With clean clusters and n_probe covering the true cluster,
    IVF top-5 must agree with the exact scan."""
    queries = clustered_vectors.filter(F.col("vec_id") < 3)
    exact = cosine_topk(clustered_vectors, queries, k=5)
    approx = ivf_topk(
        clustered_vectors, queries, k=5, n_centroids=3, n_probe=1
    )
    e = {(r.q_id, r.vec_id) for r in exact.collect()}
    a = {(r.q_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"IVF recall {recall} below 0.9"


def test_ivf_probes_widen_candidates(clustered_vectors):
    """More probes can only add candidates, never lose them."""
    queries = clustered_vectors.filter(F.col("vec_id") == 0)
    narrow = ivf_topk(clustered_vectors, queries, k=50, n_centroids=3, n_probe=1)
    wide = ivf_topk(clustered_vectors, queries, k=50, n_centroids=3, n_probe=3)
    n = {r.vec_id for r in narrow.collect()}
    w = {r.vec_id for r in wide.collect()}
    assert n <= w
    assert len(w) > len(n)


def test_kmeans_recovers_cluster_centers(clustered_vectors):
    """On clean clusters, 3 Lloyd iterations must place each centroid
    on one cluster (cosine to the true center > 0.99)."""
    import math

    from spark_flink_streaming_example_with_test_spark.operators.similarity import kmeans_fit

    cents = kmeans_fit(clustered_vectors, k=3, iters=3)
    rows = cents.collect()
    assert len(rows) == 3
    true = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    matched = set()
    for r in rows:
        best = max(range(3), key=lambda i: cos(r.cv, true[i]))
        assert cos(r.cv, true[best]) > 0.99
        matched.add(best)
    assert matched == {0, 1, 2}  # one centroid per cluster, no collapse


def test_ivf_with_kmeans_centroids_exact_recall(clustered_vectors):
    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.operators.similarity import kmeans_fit

    queries = clustered_vectors.filter(F.col("vec_id") < 3)
    cents = kmeans_fit(clustered_vectors, k=3, iters=3)
    exact = cosine_topk(clustered_vectors, queries, k=5)
    approx = ivf_topk(
        clustered_vectors, queries, k=5, n_probe=1, centroids=cents
    )
    e = {(r.q_id, r.vec_id) for r in exact.collect()}
    a = {(r.q_id, r.vec_id) for r in approx.collect()}
    assert e == a  # trained quantizer -> perfect recall at n_probe=1


def test_asof_forward_with_tolerance(spark):
    """Forward direction picks the EARLIEST right row at-or-after
    each left timestamp; tolerance nulls matches farther than the
    bound; equal-timestamp ties go to the largest tiebreak."""
    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"),
         (1, "2024-01-01 13:00:00", "b"),
         (2, "2024-01-01 10:00:00", "c")],
        "k long, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", 100),
         (1, "2024-01-01 10:30:00", 101),   # tie: larger rid wins
         (1, "2024-01-01 16:00:00", 102),   # 3h after left 'b' -> out of tolerance
         (2, "2024-01-01 09:00:00", 200)],  # before left 'c' -> no forward match
        "k long, rts string, rid long",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_payload=["rid"], right_tiebreak="rid",
        how="left", direction="forward", tolerance="2 hours",
    )
    got = {r.tag: r.asof_rid for r in out.collect()}
    assert got == {"a": 101, "b": None, "c": None}

    inner = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_payload=["rid"], right_tiebreak="rid",
        how="inner", direction="forward", tolerance=None,
    )
    got_inner = {r.tag: r.asof_rid for r in inner.collect()}
    # Without tolerance, left 'b' reaches the 16:00 row.
    assert got_inner == {"a": 101, "b": 102}


def test_asof_tolerance_validation(trades_quotes):
    """A malformed tolerance must raise a clear ValueError at
    plan-build time, before any Spark analysis runs."""
    trades, quotes = trades_quotes

    def build(tol):
        return asof_join(
            trades, quotes, on="uid", left_ts="t_ts", right_ts="q_ts",
            right_payload=["qid"], right_tiebreak="qid", tolerance=tol,
        )

    with pytest.raises(ValueError, match="unknown unit"):
        build("2 fortnights")
    with pytest.raises(ValueError, match="pairs"):
        build("2")
    with pytest.raises(ValueError, match="non-negative number"):
        build("-5 minutes")
    with pytest.raises(ValueError, match="non-empty"):
        build("   ")
    # Compound intervals are valid and must still build + run.
    out = build("1 hour 30 minutes")
    assert out.count() == 3


def test_asof_empty_right_side(spark, trades_quotes):
    """Empty right side: inner drops everything, left keeps all rows
    with null payload — no exception."""
    trades, quotes = trades_quotes
    empty_quotes = quotes.limit(0)
    inner = asof_join(
        trades, empty_quotes, on="uid", left_ts="t_ts", right_ts="q_ts",
        right_payload=["qid"], right_tiebreak="qid", how="inner",
    )
    assert inner.count() == 0
    left = asof_join(
        trades, empty_quotes, on="uid", left_ts="t_ts", right_ts="q_ts",
        right_payload=["qid"], right_tiebreak="qid", how="left",
    )
    rows = left.collect()
    assert len(rows) == 5
    assert all(r.asof_qid is None for r in rows)
