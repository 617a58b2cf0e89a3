"""Similarity search over embedding columns (array<float>).

Two tiers, per the north-star design:
- ``cosine_topk``: brute-force exact top-k against a (small) query
  set. The query side broadcasts; the corpus streams through one
  scan; dot products are zip_with/aggregate fold expressions —
  JVM-side, codegen-friendly, no Python. Correct at any corpus size,
  O(|corpus| x |queries|) work.
- ``lsh_bucket`` + ``bucketed_similar_pairs``: the scale path for
  all-pairs similarity — sign-bit LSH buckets (random-hyperplane
  family degenerate to axis hyperplanes: deterministic, no stored
  model) so the self-join only compares within buckets. An IVF
  variant (k-means centroids) would slot in the same join shape.

Norms are precomputed once per row; embeddings are cast float ->
double before arithmetic so the fold is stable and engines agree
bit-for-bit with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_flink_streaming_example_with_test_spark.functions.partitioning import ensure_min_partitions


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product — deterministic accumulation
    order (element order), double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def with_unit_prep(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cast to double and attach the L2 norm. The norm fold runs
    after a parallelism guard so a single-file corpus doesn't pin
    the vector math to one core (see ensure_min_partitions)."""
    return (
        ensure_min_partitions(df)
        .withColumn("v", F.col(vec_col).cast("array<double>"))
        .withColumn("v_norm", l2_norm("v"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (q_id, vec_id, cos_sim, rk). Ranking orders on the
    ROUNDED similarity with id tiebreak so float noise can't flip
    ranks between runs or engines.
    """
    c = with_unit_prep(corpus, vec_col)
    q = with_unit_prep(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"),
    )
    sim = F.round(dot("v", "qv") / (F.col("v_norm") * F.col("q_norm")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(F.col("q_id"), F.col(id_col), sim.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def lsh_bucket(v: Column | str, n_bits: int = 8) -> Column:
    """Sign-bit LSH bucket id from the first ``n_bits`` components:
    bucket = sum_i (v[i] > 0) << i. 2^n_bits buckets."""
    col = F.col(v) if isinstance(v, str) else v
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(col[i] > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer partitions the
    corpus into inverted lists; each query probes only its ``n_probe``
    nearest lists. Pass ``centroids`` (cent_id, cv) — e.g. from
    ``kmeans_fit`` — to use a trained quantizer instead of the seed
    stand-in.

    Centroids here are a deterministic training stand-in — the first
    ``n_centroids`` corpus vectors by id (a real deployment would
    k-means a sample; the join shape is identical). Assignment and
    probing are broadcast nested-loop against the tiny centroid set
    (n_centroids rows), so the only shuffle is the final per-query
    top-k window over ~(n_probe / n_centroids) of the corpus —
    the 100 TB win over brute force.

    Output: (q_id, vec_id, cos_sim, rk) — same contract as
    ``cosine_topk`` so callers can swap exact for approximate.
    """
    if centroids is not None:
        cents = centroids.select(
            "cent_id",
            F.col("cv").cast("array<double>").alias("cv"),
            l2_norm(F.col("cv").cast("array<double>")).alias("c_norm"),
        )
    else:
        cents = with_unit_prep(
            corpus.filter(F.col(id_col) < n_centroids), vec_col
        ).select(
            F.col(id_col).alias("cent_id"),
            F.col("v").alias("cv"),
            F.col("v_norm").alias("c_norm"),
        )

    def nearest(df: DataFrame, did: str, n: int, out: str) -> DataFrame:
        """Top-n centroids per row of df (id did, vec v, norm v_norm)."""
        csim = F.round(dot("v", "cv") / (F.col("v_norm") * F.col("c_norm")), 6)
        w = Window.partitionBy(did).orderBy(F.desc("c_sim"), F.asc("cent_id"))
        return (
            df.crossJoin(F.broadcast(cents))
            .select(df["*"], F.col("cent_id"), csim.alias("c_sim"))
            .withColumn(out, F.row_number().over(w))
            .filter(F.col(out) <= n)
            .drop("c_sim", out)
        )

    lists = nearest(with_unit_prep(corpus, vec_col), id_col, 1, "crk").select(
        F.col(id_col), "v", "v_norm", "cent_id"
    )
    q_prepped = with_unit_prep(queries, vec_col).select(
        F.col(id_col).alias("q_id"), "v", "v_norm"
    )
    probes = nearest(q_prepped, "q_id", n_probe, "prk").select(
        "q_id", F.col("v").alias("qv"), F.col("v_norm").alias("q_norm"), "cent_id"
    )

    sim = F.round(dot("v", "qv") / (F.col("v_norm") * F.col("q_norm")), 6)
    scored = (
        lists.join(probes, "cent_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col), sim.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dedup: for every vector that has a
    lower-id neighbor with cosine >= threshold (within its LSH
    bucket), emit (drop_id, keep_id, best cos). One row per dropped
    vector — the dedup decision, not just the pair list."""
    pairs = bucketed_similar_pairs(df, threshold, n_bits, id_col, vec_col)
    return pairs.groupBy(F.col("id_b").alias("drop_id")).agg(
        F.min("id_a").alias("keep_id"),
        F.round(F.max("cos_sim"), 6).alias("max_cos"),
    )


def bucketed_similar_pairs(
    df: DataFrame,
    threshold: float = 0.25,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold, restricted to LSH-bucket
    collisions: the self-join shuffles on the bucket id so each
    partition only compares its own bucket — O(sum of bucket^2)
    instead of O(n^2). Recall is tunable via n_bits (fewer bits =
    more recall, bigger buckets)."""
    prepped = with_unit_prep(df, vec_col).select(
        F.col(id_col), "v", "v_norm", lsh_bucket("v", n_bits).alias("bucket")
    )
    a = prepped.select(
        F.col(id_col).alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("v_norm").alias("norm_a"),
        "bucket",
    )
    b = prepped.select(
        F.col(id_col).alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("v_norm").alias("norm_b"),
        "bucket",
    )
    sim = dot("v_a", "v_b") / (F.col("norm_a") * F.col("norm_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(sim >= threshold)
        .select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid (element-wise mean vector) via Arrow-batched
    ``applyInPandas`` — the documented escape hatch for semantics the
    built-in aggregates can't express (there is no element-wise array
    mean in pyspark.sql.functions; the explode+groupBy(position)
    alternative shuffles |corpus| x dim rows instead of |corpus|).

    One shuffle on the label key, NumPy does the column math per
    group, centroid elements rounded JVM-side for cross-engine
    stability.
    """
    import numpy as np
    import pandas as pd

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype("float64")
        return pd.DataFrame(
            {
                label_col: [pdf[label_col].iloc[0]],
                "n": [len(pdf)],
                "centroid": [mat.mean(axis=0).tolist()],
            }
        )

    out = df.select(label_col, vec_col).groupBy(label_col).applyInPandas(
        centroid, f"{label_col} int, n long, centroid array<double>"
    )
    return out.select(
        label_col,
        "n",
        F.transform("centroid", lambda x: F.round(x, 6)).alias("centroid"),
    )


def sq_dist(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance as a fold expression."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame-native Lloyd's k-means for the IVF coarse quantizer:
    (cent_id int, cv array<double>).

    Each iteration is one broadcast nested-loop assignment (centroids
    are k rows — trivially broadcastable) plus one applyInPandas
    centroid recompute (shuffle on cent_id, k groups). Driver only
    orchestrates the loop; all data stays distributed — at 100 TB
    you'd fit on a sample, but the plan shape is already the right
    one. Deterministic: seeded by the first k vectors, distances
    rounded before the argmin so float noise can't flip assignments,
    ties break to the lowest cent_id. Empty clusters drop (k may
    shrink)."""
    prepped = with_unit_prep(df, vec_col).select(F.col(id_col).alias("__id"), "v")
    cents = prepped.filter(F.col("__id") < k).select(
        F.col("__id").cast("int").alias("cent_id"), F.col("v").alias("cv")
    )
    for _ in range(iters):
        d = F.round(sq_dist("v", "cv"), 6)
        w = Window.partitionBy("__id").orderBy("d", "cent_id")
        assigned = (
            prepped.crossJoin(F.broadcast(cents))
            .select("__id", "v", "cent_id", d.alias("d"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        cents = label_centroids(
            assigned.select(F.col("cent_id").alias("label"), F.col("v")),
            label_col="label",
            vec_col="v",
        ).select(F.col("label").alias("cent_id"), F.col("centroid").alias("cv"))
    return cents
