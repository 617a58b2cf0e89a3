"""Similarity search over embedding columns (array<float>).

Two tiers, per the north-star design:
- ``cosine_topk``: brute-force exact top-k against a (small) query
  set. The query side broadcasts; the corpus streams through one
  scan; dot products are zip_with/aggregate fold expressions —
  JVM-side, codegen-friendly, no Python. Correct at any corpus size,
  O(|corpus| x |queries|) work.
- ``lsh_bucket`` + ``bucketed_similar_pairs``: the scale path for
  all-pairs similarity — random-hyperplane LSH (seeded Rademacher
  projections: deterministic, no stored model) so the self-join only
  compares within buckets. Axis-aligned sign bits would degenerate on
  real embedding models (post-ReLU/softmax components are mostly
  positive -> one mega-bucket -> O(n^2) self-join); pseudo-random
  hyperplanes split any direction of the sphere evenly, and
  ``max_bucket_size`` stop-bucket capping (mirroring
  operators/dedup.py lsh_candidate_pairs) bounds the worst case
  structurally. An IVF variant (k-means centroids) slots into the
  same join shape.

Norms are precomputed once per row; embeddings are cast float ->
double before arithmetic so the fold is stable and engines agree
bit-for-bit with the DuckDB oracle.
"""

from __future__ import annotations

import functools
import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_flink_streaming_example_with_test_spark.functions.partitioning import ensure_min_partitions
from spark_flink_streaming_example_with_test_spark.functions.persistence import register
from spark_flink_streaming_example_with_test_spark.functions.sqltext import (
    sql_double_lit,
    sql_ident,
    sql_with,
)


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product — deterministic accumulation
    order (element order), double precision. String operands take
    the single-parse F.expr path (r14): same fold tree, one py4j
    round-trip instead of the nested-lambda construction."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    """Spark SQL text twin of :func:`dot` — identical fold tree."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"


def l2_norm(v: Column | str) -> Column:
    if isinstance(v, str):
        return F.expr(l2_norm_sql(v))
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_norm_sql(v: str) -> str:
    """Spark SQL text twin of :func:`l2_norm` — identical fold tree."""
    return f"sqrt(aggregate({v}, 0.0D, (acc, x) -> acc + x * x))"


def with_unit_prep(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cast to double and attach the L2 norm. The norm fold runs
    after a parallelism guard so a single-file corpus doesn't pin
    the vector math to one core (see ensure_min_partitions).

    Zero-norm vectors are DROPPED here: cosine is undefined for
    them (the division raises under ANSI semantics — found by the
    SemDeDup property test on all-zero embeddings), and a zero
    vector can never be anyone's neighbor, so exclusion is the
    correct retrieval semantics, applied once for every cosine
    consumer."""
    return (
        ensure_min_partitions(df)
        .withColumn("v", F.expr(f"CAST({sql_ident(vec_col)} AS array<double>)"))
        .withColumn("v_norm", l2_norm("v"))
        .filter("v_norm > 0")
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
    idq = sql_ident(id_col)
    q = with_unit_prep(queries, vec_col).selectExpr(
        f"{idq} AS q_id", "v AS qv", "v_norm AS q_norm"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(f"{idq} != q_id")
        .selectExpr(
            "q_id",
            idq,
            f"round({dot_sql('v', 'qv')} / (v_norm * q_norm), 6) AS cos_sim",
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def hyperplane_signs(
    n_bits: int, dim: int, seed: int = 7
) -> list[list[float]]:
    """Deterministic Rademacher (+1/-1) hyperplane coefficients for
    random-hyperplane LSH, derived from sha256(seed:bit:dim) — no
    stored model, identical on every run/engine, and (unlike
    axis-aligned sign bits) uncorrelated with any particular embedding
    model's component distribution."""
    planes: list[list[float]] = []
    for b in range(n_bits):
        row = []
        for i in range(dim):
            digest = hashlib.sha256(f"{seed}:{b}:{i}".encode()).digest()
            row.append(1.0 if digest[0] % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(
    v: Column | str, n_bits: int = 8, dim: int = 64, seed: int = 7
) -> Column:
    """Random-hyperplane LSH bucket id: bit b is the sign of the
    projection onto the b-th seeded Rademacher hyperplane,
    bucket = sum_b (v . h_b > 0) << b. 2^n_bits buckets.

    The projection is an explicit left-associated multiply-add chain
    (not a fold) so the floating-point evaluation order is pinned and
    a SQL oracle building the same chain agrees bit-for-bit on every
    sign decision. Missing components (len(v) < dim) contribute 0.

    When ``v`` is a column NAME the n_bits x dim expression tree is
    built as ONE SQL string handed to ``F.expr`` (r14 optimization):
    assembling the same tree with per-term Column operator calls
    costs ~4 py4j round-trips per term — measured 4-7 s of pure
    driver-side Python for 8x64 before any job starts, the dominant
    cost of every bucketed-similarity query at bench scale — while
    the JVM parses the equivalent string in ~10 ms. The parsed tree
    is identical (same COALESCE/multiply/add/CASE chain, same
    left-associated float order, double literals spelled ``D``), so
    every sign decision and bucket id is bit-for-bit unchanged;
    pinned by tests/test_similarity.py::test_lsh_bucket_expr_matches_column_form.
    """
    if isinstance(v, str):
        return F.expr(lsh_bucket_sql(v, n_bits, dim, seed))
    col = v
    bucket = F.lit(0)
    for b, coeffs in enumerate(hyperplane_signs(n_bits, dim, seed)):
        proj: Column | None = None
        for i, c in enumerate(coeffs):
            term = F.coalesce(col[i], F.lit(0.0)) * F.lit(c)
            proj = term if proj is None else proj + term
        bucket = bucket + F.when(proj > 0, F.lit(1 << b)).otherwise(0)
    return bucket


@functools.lru_cache(maxsize=32)
def lsh_bucket_sql(
    v: str, n_bits: int = 8, dim: int = 64, seed: int = 7
) -> str:
    """SQL text of :func:`lsh_bucket` for a column NAME ``v`` — the
    r14 single-parse string, shared (and lru-cached: the text is a
    pure function of its arguments, ~n_bits x dim string work per
    build) by ``lsh_bucket`` and the fused prep fragment in
    ``bucketed_similar_pairs``."""
    cases = []
    for b, coeffs in enumerate(hyperplane_signs(n_bits, dim, seed)):
        terms = " + ".join(
            f"(COALESCE({v}[{i}], 0.0D) * {c}D)"
            for i, c in enumerate(coeffs)
        )
        cases.append(f"CASE WHEN ({terms}) > 0 THEN {1 << b} ELSE 0 END")
    return "0 + " + " + ".join(cases)


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


def ivf_assignments(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse-quantizer assignment: every corpus vector's single
    nearest centroid (the same seeded first-``n_centroids``-by-id
    stand-in ``ivf_topk`` uses), exposed for index diagnostics —
    list-balance auditing needs the assignment itself, not the
    probe results. Returns (id_col, cent_id).

    At 100 TB: one broadcast of the tiny centroid set + a per-row
    argmax — no shuffle at all until the caller aggregates.
    """
    cents = with_unit_prep(
        corpus.filter(F.col(id_col) < n_centroids), vec_col
    ).select(
        F.col(id_col).alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("v_norm").alias("c_norm"),
    )
    prepped = with_unit_prep(corpus, vec_col)
    csim = F.round(dot("v", "cv") / (F.col("v_norm") * F.col("c_norm")), 6)
    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc("cent_id"))
    return (
        prepped.crossJoin(F.broadcast(cents))
        .select(F.col(id_col), F.col("cent_id"), csim.alias("c_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cent_id")
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-dedup: for every vector that has a
    lower-id neighbor with cosine >= threshold (within its LSH
    bucket), emit (drop_id, keep_id, best cos). One row per dropped
    vector — the dedup decision, not just the pair list."""
    pairs = bucketed_similar_pairs(
        df, threshold, n_bits, id_col, vec_col, dim, max_bucket_size
    )
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
    dim: int = 64,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """All-pairs cosine >= threshold, restricted to LSH-bucket
    collisions: the self-join shuffles on the bucket id so each
    partition only compares its own bucket — O(sum of bucket^2)
    instead of O(n^2). Recall is tunable via n_bits (fewer bits =
    more recall, bigger buckets).

    ``max_bucket_size`` is the stop-bucket guard (same rationale as
    dedup.lsh_candidate_pairs): a bucket of k members emits k^2/2
    comparisons, so one degenerate bucket — near-identical vectors,
    or a distribution a hash family handles badly — can dominate the
    job. Buckets above the cap are dropped entirely; None disables.
    """
    from pyspark import StorageLevel

    # NOT a spark.sql fragment (r15, measured): this operator's plan
    # is dominated by the 8x64-term bucket expression, and splicing
    # that ~40 KB of text into a nested SQL fragment makes PARSING
    # the dominant construction cost (fused-fragment A/B: 216 ->
    # 280 ms median, a regression) — the Column chain parses the
    # giant expr once via F.expr and re-analyzes cheaply. The small
    # pair-emission fragment below (whose text is tiny; the prepped
    # plan enters pre-analyzed through the view) is kept.
    prepped = with_unit_prep(df, vec_col).select(
        F.col(id_col),
        "v",
        "v_norm",
        lsh_bucket("v", n_bits, dim).alias("bucket"),
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("bucket")
        prepped = (
            prepped.withColumn("__n", F.count("*").over(w))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    # Both self-join sides consume this frame; unpersisted, the whole
    # prep (scan -> norm fold -> n_bits x dim projection -> window
    # cap) runs twice — measured 2.25 s vs 1.34 s at sf0.1 (r14), and
    # structurally two corpus scans instead of one. MEMORY_AND_DISK:
    # spills rather than OOMs at scale; same LRU-release stance as
    # the dedup builders' persisted frames (register() lets sweep
    # harnesses release it eagerly).
    prepped = register(prepped.persist(StorageLevel.MEMORY_AND_DISK))
    return _bucket_pairs_fragment(prepped, id_col, threshold)


def _bucket_pairs_fragment(
    prepped: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """The bucket self-join scored-pair emission over a persisted
    (id, v, v_norm, bucket) frame, as one SQL fragment (r15): same
    join/filter/round trees as the 6-call DataFrame chain it
    replaces, one parse."""
    idq = sql_ident(id_col)
    sim = f"({dot_sql('v_a', 'v_b')} / (norm_a * norm_b))"
    return sql_with(
        prepped.sparkSession,
        f"SELECT id_a, id_b, round({sim}, 6) AS cos_sim FROM "
        f"(SELECT {idq} AS id_a, v AS v_a, v_norm AS norm_a, bucket FROM {{p}}) "
        f"JOIN "
        f"(SELECT {idq} AS id_b, v AS v_b, v_norm AS norm_b, bucket FROM {{p}}) "
        f"USING (bucket) "
        f"WHERE id_a < id_b AND {sim} >= {sql_double_lit(threshold)}",
        p=prepped,
    )


def label_centroid_positions(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """Per-(label, position) centroid components as long-form rows
    ``(label, n, pos, val)`` — the 100 TB-safe centroid aggregation.

    ``posexplode`` widens each vector to dim rows, but the
    ``groupBy(label, pos)`` aggregate is map-side combinable: every
    mapper reduces its split to at most k x dim partial rows before
    the exchange, so the shuffle carries k x dim x mappers tiny rows
    and no reducer ever materializes a label's full vector set. (The
    previous ``applyInPandas`` form shuffled every vector of a label
    into ONE pandas group — terabytes per task at 100 TB.) Fully
    JVM-side: whole-stage codegen, no Arrow transfer.

    Precondition: all non-null vectors of a label share one
    dimension. NULL/empty vectors contribute nothing (``posexplode``
    emits no rows for them); *ragged* vectors would silently average
    each position over only the vectors long enough to reach it.
    Pass ``expected_dim`` to enforce the precondition in-plan: a
    codegen'd ``assert_true`` fails the job on the first vector whose
    size differs (nulls stay exempt) — a per-row expression, no extra
    pass or shuffle.
    """
    if expected_dim is not None:
        ok = F.col(vec_col).isNull() | (F.size(vec_col) == F.lit(expected_dim))
        df = df.filter(
            F.assert_true(
                ok, F.concat(F.lit(f"{vec_col} dimension != {expected_dim}: size="), F.size(vec_col))
            ).isNull()
        )
    return (
        df.select(label_col, F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(label_col, "pos")
        .agg(F.count("*").alias("n"), F.round(F.avg("x"), 6).alias("val"))
        .select(label_col, "n", "pos", "val")
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """Per-label centroid (element-wise mean vector): the long-form
    position means from :func:`label_centroid_positions` re-assembled
    into ``(label, n, centroid array<double>)``.

    The re-assembly groups k x dim tiny rows by label — k groups of
    dim scalars, trivially reducer-safe at any corpus size because the
    corpus was already aggregated away in the positions step.
    Uniform-dimension precondition and the optional ``expected_dim``
    in-plan guard: see :func:`label_centroid_positions`.
    """
    pos = label_centroid_positions(df, label_col, vec_col, expected_dim)
    return pos.groupBy(label_col).agg(
        F.max("n").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "val"))),
            lambda s: s["val"],
        ).alias("centroid"),
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
    are k rows — trivially broadcastable) plus one centroid recompute
    via :func:`label_centroids` — the posexplode + groupBy(cent_id,
    pos) MAP-SIDE PARTIAL aggregation, fully JVM-side (no Arrow, no
    pandas; the shuffle carries at most k x dim partial rows per
    mapper). Driver only orchestrates the loop; all data stays
    distributed — at 100 TB you'd fit on a sample, but the plan
    shape is already the right one. Deterministic: seeded by the
    first k vectors, distances rounded before the argmin so float
    noise can't flip assignments, ties break to the lowest cent_id.
    Empty clusters drop (k may shrink)."""
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


def pq_encode(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Product-quantization encoding: each vector is split into ``m``
    contiguous subvectors and each subvector is assigned the id of
    its nearest codebook centroid (squared L2), yielding an m-byte
    code per vector — the storage layer under IVF-PQ ANN indexes.

    The codebook here is seeded deterministically (the vectors with
    ``id < k``, sliced per subspace) — the same convention as the IVF
    seed centroids — so both engines can reproduce it; a trained
    codebook (k-means per subspace) would slot into the same plan.

    Output: ``(vec_id, codes array<long>, qerr)`` where ``qerr`` is
    the total squared reconstruction error (sum of per-subspace
    min distances), rounded for cross-engine comparison.

    Scale shape: the codebook is k tiny rows broadcast to every
    executor (an intentional k-fold row expansion, k constant); the
    argmin folds back map-side via ``min(struct(dist, cent_id))`` —
    deterministic tiebreak on centroid id, one shuffle keyed by
    ``id_col``, no per-vector state anywhere.
    """
    if dim % m != 0:
        raise ValueError(f"m ({m}) must divide dim ({dim})")
    sub = dim // m
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cb = v.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cent_id"), F.col("v").alias("cv")
    )

    def sub_dist(j: int) -> Column:
        dv = F.slice("v", j * sub + 1, sub)
        dc = F.slice("cv", j * sub + 1, sub)
        return F.aggregate(
            F.zip_with(dv, dc, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    pairs = v.crossJoin(F.broadcast(cb)).select(
        id_col,
        "cent_id",
        *[sub_dist(j).alias(f"d{j}") for j in range(m)],
    )
    best = pairs.groupBy(id_col).agg(
        *[
            F.min(F.struct(F.col(f"d{j}").alias("d"), F.col("cent_id").alias("c"))).alias(f"b{j}")
            for j in range(m)
        ]
    )
    qerr = sum(F.col(f"b{j}.d") for j in range(m))
    return best.select(
        id_col,
        F.array(*[F.col(f"b{j}.c") for j in range(m)]).alias("codes"),
        F.round(qerr, 6).alias("qerr"),
    )


def pq_subvectors(
    df: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Long-form subspace view for PQ training/encoding: one row per
    (vector, subspace) — ``(__id, j, sv array<double>)``. The m-fold
    row expansion is the PQ decomposition itself (m is a small
    constant); downstream joins key on ``j`` so every subspace
    trains in the same distributed pass."""
    if dim % m != 0:
        raise ValueError(f"m ({m}) must divide dim ({dim})")
    sub = dim // m
    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return v.select(
        "__id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.slice("v", j * sub + 1, sub).alias("sv"),
                )
                for j in range(m)
            ])
        ).alias("e"),
    ).select("__id", F.col("e.j").alias("j"), F.col("e.sv").alias("sv"))


def pq_train_codebook(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Trained PQ codebook: per-subspace Lloyd's k-means, all ``m``
    subspaces trained SIMULTANEOUSLY in one distributed loop —
    ``(j int, cent_id int, cv array<double>)``. ``iters=0`` returns
    the seeded codebook (vectors with id < k, sliced per subspace —
    the same convention :func:`pq_encode` quantizes against), so
    seed-vs-trained comparisons share one code path.

    Per iteration: assignment is a broadcast join on ``j`` (the
    codebook is m*k tiny rows) with the same rounded-distance /
    lowest-cent-id determinism as :func:`kmeans_fit`; the centroid
    update reuses :func:`label_centroids`' map-side-combinable
    posexplode aggregation keyed by a packed (j, cent_id) label.
    Empty cells drop (a subspace's k may shrink), exactly like
    kmeans_fit.

    At 100 TB: each iteration is one shuffle keyed by (j, __id) for
    the argmin plus one k*m*sub-row centroid exchange; nothing scales
    with corpus size except the scan. Train on a sample in practice
    — the plan shape is already the sampled plan's shape.
    """
    from pyspark import StorageLevel

    subs = pq_subvectors(df, m=m, id_col=id_col, vec_col=vec_col, dim=dim)
    if iters > 0:
        subs = register(subs.persist(StorageLevel.MEMORY_AND_DISK))
    cents = subs.filter(F.col("__id") < k).select(
        "j", F.col("__id").cast("int").alias("cent_id"),
        F.col("sv").alias("cv"),
    )
    for _ in range(iters):
        d = F.round(sq_dist("sv", "cv"), 6)
        w = Window.partitionBy("j", "__id").orderBy("d", "cent_id")
        assigned = (
            subs.join(F.broadcast(cents), "j")
            .select("j", "__id", "sv", "cent_id", d.alias("d"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        packed = assigned.select(
            (F.col("j") * F.lit(k) + F.col("cent_id")).alias("label"),
            F.col("sv"),
        )
        cents = label_centroids(packed, label_col="label", vec_col="sv").select(
            F.floor(F.col("label") / k).cast("int").alias("j"),
            (F.col("label") % k).cast("int").alias("cent_id"),
            F.col("centroid").alias("cv"),
        )
    return cents


def pq_quantization_error(
    df: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-subspace total quantization error of a corpus under a
    given codebook: ``(j, sq_err)`` where sq_err sums each vector's
    min squared distance to the subspace's centroids. Broadcast
    codebook, min-struct argmin fold, map-side-combinable final sum
    — one scan regardless of codebook origin (seed or trained)."""
    subs = pq_subvectors(df, m=m, id_col=id_col, vec_col=vec_col, dim=dim)
    d = F.round(sq_dist("sv", "cv"), 6)
    per_vec = (
        subs.join(F.broadcast(codebook), "j")
        .select("j", "__id", d.alias("d"))
        .groupBy("j", "__id")
        .agg(F.min("d").alias("dmin"))
    )
    return per_vec.groupBy("j").agg(
        F.round(F.sum("dmin"), 4).alias("sq_err")
    )


def cluster_semantic_duplicates(
    df: DataFrame,
    cluster_col: str = "label",
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    dedup bounded by a CLUSTER key — all-pairs cosine runs only
    within each cluster, and every vector with a lower-id
    same-cluster neighbor above threshold is dropped in favor of
    that neighbor. The paper clusters with k-means; any precomputed
    cluster id column slots in (the catalog query uses the fixture
    label). Same keep-first contract as embedding_near_duplicates —
    the difference is the blocking key: semantic cluster vs LSH
    bucket.

    Scale shape: one shuffle on the cluster key; O(sum of
    cluster^2) comparisons with the same stop-cluster cap as the
    LSH path (SemDeDup's cost model assumes balanced k-means
    clusters; the cap is the guard when they aren't).
    """
    prepped = with_unit_prep(df, vec_col).select(
        F.col(id_col), F.col(cluster_col).alias("__cluster"), "v", "v_norm"
    )
    if max_cluster_size is not None:
        w = Window.partitionBy("__cluster")
        prepped = (
            prepped.withColumn("__n", F.count("*").over(w))
            .filter(F.col("__n") <= max_cluster_size)
            .drop("__n")
        )
    a = prepped.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("v_a"),
        F.col("v_norm").alias("norm_a"), "__cluster",
    )
    b = prepped.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("v_b"),
        F.col("v_norm").alias("norm_b"), "__cluster",
    )
    sim = dot("v_a", "v_b") / (F.col("norm_a") * F.col("norm_b"))
    pairs = (
        a.join(b, "__cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(sim, 6) >= threshold)
        .select(
            "__cluster", "id_a", "id_b", F.round(sim, 6).alias("cos_sim")
        )
    )
    return pairs.groupBy(
        F.col("__cluster").alias("cluster"), F.col("id_b").alias("drop_id")
    ).agg(
        F.min("id_a").alias("keep_id"),
        F.round(F.max("cos_sim"), 6).alias("max_cos"),
    )
