"""Behavioral tests for similarity search with hand-computable
vectors."""

from __future__ import annotations

import math

import pytest

from spark_flink_streaming_example_with_test_spark.operators.similarity import (
    bucketed_similar_pairs,
    cosine_topk,
    l2_norm,
    lsh_bucket,
    with_unit_prep,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.0, 0.0]),   # between 0 and 2
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_cosine_topk_ordering(vectors):
    queries = vectors.filter(F.col("vec_id") == 0)
    out = cosine_topk(vectors, queries, k=4).orderBy("rk").collect()
    assert [r.vec_id for r in out] == [1, 4, 2, 3]
    assert out[0].cos_sim == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert out[2].cos_sim == 0.0
    assert out[3].cos_sim == -1.0


def test_l2_norm_expression(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["v"])
    assert df.select(l2_norm("v").alias("n")).collect()[0].n == 5.0


def test_lsh_bucket_sign_bits(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -1.0, 1.0]), (1, [1.0, -1.0, 2.0]), (2, [-1.0, 1.0, 1.0])],
        ["vec_id", "v"],
    )
    out = {r.vec_id: r.b for r in df.select("vec_id", lsh_bucket("v", 3).alias("b")).collect()}
    assert out[0] == 0b101 and out[1] == 0b101 and out[2] == 0b110


def test_bucketed_pairs_find_same_direction(vectors):
    pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in bucketed_similar_pairs(vectors, threshold=0.5, n_bits=4).collect()
    }
    # 1=[.9,.1,..] and 4=[.5,.5,..] share the sign pattern (+,+,-,-)
    # -> same bucket, sim ~0.78 passes the threshold.
    assert (1, 4) in pairs
    # 0=[1,0,..] has sign pattern (+,-,-,-): a different bucket than 1
    # (recall loss at the 0-boundary is expected LSH behavior), and
    # 3=[-1,0,..] can never pair with 0 (opposite first sign).
    assert (0, 3) not in pairs and (0, 1) not in pairs
    assert all(s >= 0.5 for s in pairs.values())


def test_unit_prep_casts_to_double(vectors):
    prepped = with_unit_prep(vectors)
    assert dict(prepped.dtypes)["v"] == "array<double>"
    assert dict(prepped.dtypes)["v_norm"] == "double"
