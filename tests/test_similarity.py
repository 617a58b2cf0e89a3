"""Behavioral tests for similarity search with hand-computable
vectors."""

from __future__ import annotations

import math

import pytest

from spark_flink_streaming_example_with_test_spark.operators.similarity import (
    bucketed_similar_pairs,
    cosine_topk,
    hyperplane_signs,
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


def _expected_bucket(v, n_bits, dim):
    """Python twin of lsh_bucket for exact-value test vectors."""
    bucket = 0
    for b, coeffs in enumerate(hyperplane_signs(n_bits, dim)):
        proj = 0.0
        for i, c in enumerate(coeffs):
            proj += (v[i] if i < len(v) else 0.0) * c
        if proj > 0:
            bucket += 1 << b
    return bucket


def test_lsh_bucket_matches_hyperplane_signs(spark):
    # Exact binary fractions so float->double promotion is lossless
    # and the Python twin computes the identical projections.
    vecs = [
        (0, [1.0, -1.0, 1.0, 0.5]),
        (1, [1.0, -1.0, 2.0, 0.25]),
        (2, [-1.0, 1.0, 1.0, -0.5]),
        (3, [0.5, 0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "v"])
    out = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", lsh_bucket("v", 4, dim=4).alias("b")
        ).collect()
    }
    for vid, v in vecs:
        assert out[vid] == _expected_bucket(v, 4, 4)


def test_lsh_bucket_expr_matches_column_form(spark):
    """r14 optimization pin: the SQL-string fast path (one F.expr
    parse instead of ~4 py4j calls per term) must produce the
    bit-identical bucket id the Column-operator form produces, on
    every edge class: full vectors, NULL components, short vectors,
    empty arrays, NULL arrays, denormal-scale values, negative
    zeros."""
    rows = [
        (1, [0.5] * 16), (2, [-0.5] * 16),
        (3, [0.1, None] + [0.0] * 14),
        (4, [1.0, -1.0, 2.5]), (5, []), (6, None),
        (7, [None] * 16), (8, [1e-300] * 16), (9, [-0.0] * 16),
    ]
    df = spark.createDataFrame(rows, "vec_id INT, v ARRAY<DOUBLE>")
    both = df.select(
        "vec_id",
        lsh_bucket("v", 6, dim=16).alias("fast"),       # str -> F.expr path
        lsh_bucket(F.col("v"), 6, dim=16).alias("ref"), # Column-op path
    )
    bad = both.filter(
        (F.col("fast") != F.col("ref"))
        | (F.col("fast").isNull() != F.col("ref").isNull())
    ).count()
    assert bad == 0


def test_lsh_bucket_scale_invariant(spark):
    # Hyperplane signs depend only on direction: v and 4*v share a
    # bucket, v and -v never do (all projections flip sign).
    df = spark.createDataFrame(
        [(0, [0.5, -0.25, 1.0, 0.5]), (1, [2.0, -1.0, 4.0, 2.0]),
         (2, [-0.5, 0.25, -1.0, -0.5])],
        ["vec_id", "v"],
    )
    out = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", lsh_bucket("v", 6, dim=4).alias("b")
        ).collect()
    }
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_all_positive_embeddings_do_not_mega_bucket(spark):
    """Adversarial distribution for the old axis-aligned sign-bit
    scheme: post-ReLU-style all-positive components put EVERY vector
    in the all-ones bucket (O(n^2) self-join). Seeded random
    hyperplanes must spread them."""
    import random

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(0.05, 1.0) for _ in range(16)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    prepped = with_unit_prep(df)
    sizes = (
        prepped.select(lsh_bucket("v", 8, dim=16).alias("bucket"))
        .groupBy("bucket")
        .count()
        .collect()
    )
    assert len(sizes) > 10  # axis-aligned signs would give exactly 1
    assert max(r["count"] for r in sizes) < 0.3 * 200


def test_bucketed_pairs_find_same_direction(vectors):
    pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in bucketed_similar_pairs(
            vectors, threshold=0.5, n_bits=4, dim=4
        ).collect()
    }
    # Vectors 0=[1,0,..] and 1=[.9,.1,..] are 5.7 degrees apart; at
    # 4 hyperplane bits the collision probability per bit is
    # 1 - theta/pi ~ 0.97 — they must share a bucket here (verified
    # deterministic for this seed) and pass the 0.5 threshold.
    assert (0, 1) in pairs
    # 3=[-1,0,..] is antipodal to 0: every projection flips sign, so
    # they can never share a bucket (and cos=-1 fails the threshold
    # anyway).
    assert (0, 3) not in pairs
    assert all(s >= 0.5 for s in pairs.values())


def test_bucket_cap_drops_degenerate_bucket(spark):
    """Stop-bucket guard: identical vectors all collide in one
    bucket; with max_bucket_size below the bucket population the
    whole bucket is dropped instead of exploding quadratically."""
    rows = [(i, [1.0, 0.5, 0.25, 0.125]) for i in range(20)]
    rows += [(100, [-1.0, 0.5, -0.25, 0.125]), (101, [-1.0, 0.5, -0.25, 0.125])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    capped = bucketed_similar_pairs(
        df, threshold=0.9, n_bits=4, dim=4, max_bucket_size=10
    ).collect()
    # The 20-member bucket is dropped; the 2-member bucket survives.
    assert {(r.id_a, r.id_b) for r in capped} == {(100, 101)}
    uncapped = bucketed_similar_pairs(
        df, threshold=0.9, n_bits=4, dim=4, max_bucket_size=None
    )
    assert uncapped.count() == 20 * 19 // 2 + 1


def test_unit_prep_casts_to_double(vectors):
    prepped = with_unit_prep(vectors)
    assert dict(prepped.dtypes)["v"] == "array<double>"
    assert dict(prepped.dtypes)["v_norm"] == "double"


def test_pq_encode_assignment_and_tiebreak(spark):
    from spark_flink_streaming_example_with_test_spark.operators.similarity import pq_encode

    # dim=4, m=2 subspaces of 2; codebook = vectors 0 and 1.
    # Vector 2 is nearest centroid 1 in both subspaces; vector 3 is
    # equidistant from both centroids in subspace 0 (tie -> smaller
    # cent_id) and exactly centroid 0 in subspace 1.
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0, 0.0]),
            (1, [2.0, 0.0, 4.0, 0.0]),
            (2, [2.1, 0.0, 3.9, 0.0]),
            (3, [1.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in pq_encode(emb, m=2, k=2, dim=4).collect()}
    assert rows[0].codes == [0, 0] and rows[0].qerr == 0.0
    assert rows[1].codes == [1, 1] and rows[1].qerr == 0.0
    assert rows[2].codes == [1, 1]
    assert rows[3].codes == [0, 0]  # subspace-0 tie resolved to cent 0
    assert pq_encode(emb, m=2, k=2, dim=4).schema["codes"].dataType.simpleString() == "array<bigint>"


def test_pq_encode_rejects_bad_m(spark):
    import pytest

    from spark_flink_streaming_example_with_test_spark.operators.similarity import pq_encode

    emb = spark.createDataFrame([(0, [0.0] * 4)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="must divide"):
        pq_encode(emb, m=3, k=1, dim=4)

def test_pq_train_codebook_recovers_planted_centroids(spark):
    """Planted clusters: two tight clusters per subspace whose means
    differ from the seed vectors. Two Lloyd's iterations must move
    each trained centroid onto its planted cluster mean and beat the
    seed codebook's quantization error."""
    import statistics

    from spark_flink_streaming_example_with_test_spark.operators.similarity import (
        pq_quantization_error,
        pq_train_codebook,
    )

    # dim=4, m=2: subspace 0 = dims 1-2, subspace 1 = dims 3-4.
    # Cluster A centers (0,0 | 0,5); cluster B centers (10,10 | 10,-5).
    offs = [-1.0, -0.5, 0.0, 0.5, 1.0, 1.5]
    rows = []
    vid = 0
    for o in offs:                     # cluster A members (vec 0 first)
        rows.append((vid, [0.0 + o, 0.0 + o, 0.0 + o, 5.0 + o])); vid += 1
        rows.append((vid, [10.0 + o, 10.0 + o, 10.0 + o, -5.0 + o])); vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mean_off = statistics.mean(offs)   # 0.25: cluster means are
    # (0.25, 0.25), (10.25, 10.25) in subspace 0 etc.

    trained = pq_train_codebook(emb, m=2, k=2, iters=2, dim=4)
    cents = {(r.j, r.cent_id): r.cv for r in trained.collect()}
    assert len(cents) == 4  # 2 subspaces x 2 live cells
    for (j, _cid), cv in cents.items():
        first = cv[0]
        assert (
            abs(first - (0.0 + mean_off)) < 0.3
            or abs(first - (10.0 + mean_off)) < 0.3
        ), f"subspace {j} centroid {cv} not on a planted mean"

    seed = pq_train_codebook(emb, m=2, k=2, iters=0, dim=4)
    seed_err = {r.j: r.sq_err for r in pq_quantization_error(emb, seed, m=2, dim=4).collect()}
    trained_err = {r.j: r.sq_err for r in pq_quantization_error(emb, trained, m=2, dim=4).collect()}
    for j in seed_err:
        assert trained_err[j] <= seed_err[j] + 1e-6
    assert sum(trained_err.values()) < sum(seed_err.values())
