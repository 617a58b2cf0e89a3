"""Round-10 batch 2: evaluation & statistics operators — the
measurement side of a 100 TB curation pipeline. The other plan
modules *transform* the corpus; these queries *grade* it and the
models/filters trained on it: independence testing (chi-square),
classifier evaluation (exact Mann-Whitney AUC, calibration bins),
label-noise auditing (kNN disagreement), retrieval evaluation
(precision / NDCG), budgeted selection, duplication-discounted
source weights, and link prediction over the shared synthetic doc
graph.

Reference parity note: the reference pipeline
(spark/spark_streaming.py, flink/.../UserActivityFilterAgg.java)
has no eval surface at all — this module is gap-map §2.6 extension
surface, mandated by SURVEY.md §2's north-star list, not a port.

Numeric-emission posture (NUMERICS.md): every emitted ratio goes
through the shared exact integer half-up helpers
(functions/numerics.py); products that can pass int64 are
accumulated DECIMAL(38,0) Spark-side / HUGEINT oracle-side per the
module's overflow posture; NDCG discount factors are *shared
integer-ppm literals* generated once in Python and inlined into
both engines' SQL, so no libm call sits on the parity path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_flink_streaming_example_with_test_spark.functions import numerics as nm
from spark_flink_streaming_example_with_test_spark.functions.hashing import (
    md5_nibble,
    md5_nibble_sql,
)
from spark_flink_streaming_example_with_test_spark.operators import similarity as sim
from spark_flink_streaming_example_with_test_spark.sources.tables import load_table


def _cos_ppm(dot_over_norms: Column) -> Column:
    """Cosine → integer millionths (same construction as
    plans/curation.py:_cos_ppm): ROUND(cos, 6) — the repo-wide
    emission form — times 1e6, rounded to the adjacent integer.
    BIGINT ppm keeps every downstream MAX/SUM exact and
    order-independent."""
    return F.round(F.round(dot_over_norms, 6) * 1_000_000.0, 0).cast("long")


# ---------------------------------------------------------------------
# 1. Chi-square independence: source x lang
# ---------------------------------------------------------------------

def chi_square_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square contingency audit over the full source x
    lang grid: per cell the observed count, the expected count under
    independence, and the chi-square contribution
    (observed*N - row_tot*col_tot)^2 / (N * row_tot * col_tot) — the
    standard pre-mixing test for "is language composition uniform
    across sources", cell-level so the largest contributors are
    directly readable.

    Scale shape: three independent aggregations of the same scan
    (cell / row / column marginals; AQE shares the exchange where it
    can), then a *marginal-sized* broadcast grid (|sources| x
    |langs| rows, never corpus-sized) left-joined with the observed
    cells, so zero cells are present — the statistic is wrong
    without them. All arithmetic integer until one exact half-up
    division; diff^2 is accumulated DECIMAL(38,0)/HUGEINT, exact up
    to N ~ 1e7 docs per the module posture (beyond that, divide all
    marginals by a common power of ten first — the statistic is
    scale-invariant in that direction only for the expected side,
    so a 100 TB run recomputes at reduced count precision and the
    docstring cap is the documented trade).
    """
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("source", "lang").agg(F.count("*").alias("observed"))
    rt = docs.groupBy("source").agg(F.count("*").alias("row_tot"))
    ct = docs.groupBy("lang").agg(F.count("*").alias("col_tot"))
    tot = docs.agg(F.count("*").alias("n_total"))
    grid = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(tot))
    j = (
        grid.join(obs, ["source", "lang"], "left")
        .fillna(0, subset=["observed"])
        .withColumn(
            "diff",
            F.col("observed") * F.col("n_total")
            - F.col("row_tot") * F.col("col_tot"),
        )
    )
    return j.selectExpr(
        "source",
        "lang",
        "observed",
        nm.half_up_spark_sql(
            "CAST(row_tot AS DECIMAL(38,0)) * col_tot", "n_total", 6
        )
        + " AS expected",
        nm.half_up_spark_sql(
            "CAST(diff AS DECIMAL(38,0)) * diff",
            "CAST(n_total AS DECIMAL(38,0)) * row_tot * col_tot",
            6,
        )
        + " AS chi2_contrib",
        "diff > 0 AS over_represented",
    ).orderBy("source", "lang")


CHI_SQUARE_ORACLE = f"""
WITH rt AS (SELECT source, COUNT(*) AS row_tot FROM documents GROUP BY 1),
ct AS (SELECT lang, COUNT(*) AS col_tot FROM documents GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM documents),
obs AS (SELECT source, lang, COUNT(*) AS observed
        FROM documents GROUP BY 1, 2),
grid AS (
  SELECT rt.source, ct.lang, rt.row_tot, ct.col_tot, tot.n_total
  FROM rt CROSS JOIN ct CROSS JOIN tot
),
j AS (
  SELECT g.source, g.lang, g.row_tot, g.col_tot, g.n_total,
         COALESCE(o.observed, 0) AS observed,
         CAST(COALESCE(o.observed, 0) AS HUGEINT) * g.n_total
           - CAST(g.row_tot AS HUGEINT) * g.col_tot AS diff
  FROM grid g LEFT JOIN obs o
    ON o.source = g.source AND o.lang = g.lang
)
SELECT source, lang, observed,
  {nm.half_up_duck_sql("CAST(row_tot AS HUGEINT) * col_tot", "n_total", 6)}
    AS expected,
  {nm.half_up_duck_sql(
      "CAST(diff AS HUGEINT) * diff",
      "CAST(n_total AS HUGEINT) * row_tot * col_tot", 6)}
    AS chi2_contrib,
  diff > 0 AS over_represented
FROM j ORDER BY source, lang
"""


# ---------------------------------------------------------------------
# 2. Exact Mann-Whitney AUC
# ---------------------------------------------------------------------

def auc_mannwhitney_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of an integer quality signal (the hashed-bucket
    token-weight SUM from quality_linear_classifier's feature space,
    kept integral) as a predictor of lang = 'en', via the
    Mann-Whitney identity AUC = (wins + ties/2) / (n_pos * n_neg)
    with wins/ties counted EXACTLY — the evaluation every learned
    filter gets before it gates a 100 TB corpus.

    Scale shape: the O(n_pos * n_neg) pair count collapses to the
    aggregated distinct-score decomposition (same sanctioned shape
    as the KS family): group once by integer score, one ordered
    window over the *score-value* frame (bounded by score
    cardinality, not row count), exact integer win/tie sums
    accumulated DECIMAL(38,0)/HUGEINT, one half-up division at the
    end.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    )
    h = F.md5(F.col("term"))
    w_int = ((md5_nibble(h, 1) * 16 + md5_nibble(h, 2)) * 37) % 101
    perdoc = tok.groupBy("doc_id", "lang").agg(
        F.sum(w_int).alias("score_int")
    )
    byscore = perdoc.groupBy("score_int").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("nn"),
    )
    wnd = Window.orderBy("score_int").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = byscore.withColumn(
        "cnb", F.coalesce(F.sum("nn").over(wnd), F.lit(0))
    )
    agg = cum.agg(
        F.sum(F.col("np") * F.col("cnb")).alias("n_wins"),
        F.sum(F.col("np") * F.col("nn")).alias("n_ties"),
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.count("*").alias("n_scores"),
    )
    return agg.selectExpr(
        "n_pos",
        "n_neg",
        "n_scores",
        "n_wins",
        "n_ties",
        nm.half_up_spark_sql(
            "CAST(n_wins AS DECIMAL(38,0)) * 2 + n_ties",
            "CAST(n_pos AS DECIMAL(38,0)) * n_neg * 2",
            6,
        )
        + " AS auc",
    )


AUC_MANNWHITNEY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
perdoc AS (
  SELECT doc_id, lang,
         SUM((({md5_nibble_sql("MD5(term)", 1)} * 16
               + {md5_nibble_sql("MD5(term)", 2)}) * 37) % 101)
           AS score_int
  FROM toks GROUP BY 1, 2
),
byscore AS (
  SELECT score_int,
         COUNT(*) FILTER (lang = 'en') AS np,
         COUNT(*) FILTER (lang != 'en') AS nn
  FROM perdoc GROUP BY 1
),
cum AS (
  SELECT score_int, np, nn,
         COALESCE(SUM(nn) OVER (ORDER BY score_int
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cnb
  FROM byscore
),
agg AS (
  SELECT CAST(SUM(CAST(np AS HUGEINT) * cnb) AS HUGEINT) AS n_wins,
         CAST(SUM(CAST(np AS HUGEINT) * nn) AS HUGEINT) AS n_ties,
         CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(nn) AS BIGINT) AS n_neg,
         COUNT(*) AS n_scores
  FROM cum
)
SELECT n_pos, n_neg, n_scores,
       CAST(n_wins AS BIGINT) AS n_wins,
       CAST(n_ties AS BIGINT) AS n_ties,
       {nm.half_up_duck_sql(
           "n_wins * 2 + n_ties",
           "CAST(n_pos AS HUGEINT) * n_neg * 2", 6)} AS auc
FROM agg
"""


# ---------------------------------------------------------------------
# 3. Calibration reliability bins
# ---------------------------------------------------------------------

def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a pseudo-probability score
    (document length scaled into [0, 1) as integer thousandths
    against the corpus max) predicting lang = 'en': per decile bin
    the mean predicted probability, the empirical positive rate, and
    the absolute calibration gap — all from integer sums with one
    exact half-up division each, so the gap is the exact rational
    |sum_milli - 1000 * n_pos| / (1000 * n), never a difference of
    two rounded doubles.

    Scale shape: one broadcast max, one per-row integer expression,
    one 10-row aggregation. Nothing here changes at 1000 executors.
    """
    docs = load_table(spark, sf_dir, "documents")
    maxc = docs.agg(F.max("n_chars").alias("max_chars"))
    d = docs.crossJoin(F.broadcast(maxc)).selectExpr(
        "CAST((n_chars * 1000) div (max_chars + 1) AS BIGINT) AS milli",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos",
    )
    agg = d.selectExpr("milli div 100 AS bin", "milli", "pos").groupBy(
        "bin"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("pos").alias("n_pos"),
        F.sum("milli").alias("sum_milli"),
    )
    return agg.selectExpr(
        "bin",
        "n_docs",
        "n_pos",
        nm.half_up_spark_sql("sum_milli", "n_docs * 1000", 6)
        + " AS mean_phat",
        nm.half_up_spark_sql("n_pos", "n_docs", 6) + " AS frac_pos",
        nm.half_up_spark_sql(
            "abs(sum_milli - 1000 * n_pos)", "n_docs * 1000", 6
        )
        + " AS abs_gap",
    ).orderBy("bin")


CALIBRATION_BINS_ORACLE = f"""
WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents),
d AS (
  SELECT CAST((n_chars * 1000) // (max_chars + 1) AS BIGINT) AS milli,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents CROSS JOIN mx
),
agg AS (
  SELECT milli // 100 AS bin, COUNT(*) AS n_docs,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(milli) AS BIGINT) AS sum_milli
  FROM d GROUP BY 1
)
SELECT bin, n_docs, n_pos,
  {nm.half_up_duck_sql("sum_milli", "n_docs * 1000", 6)} AS mean_phat,
  {nm.half_up_duck_sql("n_pos", "n_docs", 6)} AS frac_pos,
  {nm.half_up_duck_sql(
      "ABS(sum_milli - 1000 * n_pos)", "n_docs * 1000", 6)} AS abs_gap
FROM agg ORDER BY bin
"""


# ---------------------------------------------------------------------
# 4. kNN label-noise audit
# ---------------------------------------------------------------------

def knn_label_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit (Confident-Learning style neighborhood
    vote): for each probe vector (vec_id < 32), the majority label
    among its 5 nearest cosine neighbors (self excluded); rows where
    the majority disagrees with the vector's own label are the
    relabel/review queue.

    Scale shape: identical to hard_negative_mining — broadcast probe
    set x corpus scan, pinned fold dot products, ppm-integer
    similarities, rank with id tiebreak; the vote is a probe-sized
    aggregation. Corpus-sized probe sets route through the IVF/LSH
    paths in operators/similarity.py instead.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    c = sim.with_unit_prep(emb)
    q = sim.with_unit_prep(emb.filter(F.col("vec_id") < 32)).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("own_label"),
        F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"),
    )
    cos = _cos_ppm(
        sim.dot("v", "qv") / (F.col("v_norm") * F.col("q_norm"))
    )
    nb = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "own_label",
            "vec_id",
            "label",
            cos.alias("cos_ppm"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_ppm"), F.asc("vec_id")
    )
    top = nb.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )
    votes = top.groupBy("q_id", "own_label", "label").agg(
        F.count("*").alias("n_votes")
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "q_id",
            "own_label",
            F.col("label").alias("majority_label"),
            F.col("n_votes").alias("n_majority"),
            (F.col("label") != F.col("own_label")).alias("mislabel"),
        )
        .orderBy("q_id")
    )


KNN_DISAGREEMENT_ORACLE = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         SQRT(LIST_SUM(LIST_TRANSFORM(embedding::DOUBLE[], x -> x * x)))
           AS nrm
  FROM embeddings
), ez AS (
  SELECT * FROM e WHERE nrm > 0
), q AS (
  SELECT vec_id AS q_id, label AS own_label, v AS qv, nrm AS q_nrm
  FROM ez WHERE vec_id < 32
), nb AS (
  SELECT q_id, own_label, vec_id, label,
         CAST(ROUND(ROUND(
           LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(v) + 1),
                    i -> v[i] * qv[i])) / (nrm * q_nrm), 6)
           * 1000000.0, 0) AS BIGINT) AS cos_ppm
  FROM ez CROSS JOIN q WHERE vec_id != q_id
), top AS (
  SELECT * FROM (
    SELECT q_id, own_label, vec_id, label,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos_ppm DESC, vec_id) AS rk
    FROM nb
  ) WHERE rk <= 5
), votes AS (
  SELECT q_id, own_label, label, COUNT(*) AS n_votes
  FROM top GROUP BY 1, 2, 3
)
SELECT q_id, own_label, label AS majority_label,
       n_votes AS n_majority, label != own_label AS mislabel
FROM (
  SELECT q_id, own_label, label, n_votes,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY n_votes DESC, label) AS vr
  FROM votes
) WHERE vr = 1 ORDER BY q_id
"""

# ---------------------------------------------------------------------
# 5. Token-budget greedy selection
# ---------------------------------------------------------------------

def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: rank documents by integer
    quality-per-token density (hashed-bucket weight sum * 1000 div
    token count) and admit whole documents in (density DESC, doc_id)
    order until 20% of the corpus token total is filled; report the
    selected doc/token counts per source — the decision query behind
    "which sources dominate the curated slice at this budget".

    Scale shape: the global sorted-prefix is decomposed the
    scale-safe way (same family as the curriculum quartiles and the
    KS/AUC windows): aggregate token sums per DISTINCT density value
    (bounded by density cardinality <= 101,000 values, not corpus
    size), one ordered window over that value frame to find the
    boundary density, then a doc-id-ordered window over the
    *boundary value's docs only* for the partial group. No global
    row sort anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    h = F.md5(F.col("term"))
    w_int = ((md5_nibble(h, 1) * 16 + md5_nibble(h, 2)) * 37) % 101
    scored = tok.groupBy("doc_id").agg(
        F.sum(w_int).alias("score_int"), F.count("*").alias("n_tok")
    )
    perdoc = (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .selectExpr(
            "doc_id",
            "source",
            "n_tok",
            "CAST((score_int * 1000) div n_tok AS BIGINT) AS dens",
        )
    )
    budget = perdoc.agg(
        (F.sum("n_tok") / 5).cast("long").alias("budget")
    )
    byval = perdoc.groupBy("dens").agg(F.sum("n_tok").alias("tok_sum"))
    wd = Window.orderBy(F.desc("dens")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    vals = (
        byval.withColumn(
            "cum_before", F.coalesce(F.sum("tok_sum").over(wd), F.lit(0))
        )
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "status",
            F.when(
                F.col("cum_before") + F.col("tok_sum") <= F.col("budget"),
                F.lit("full"),
            )
            .when(F.col("cum_before") < F.col("budget"), F.lit("boundary"))
            .otherwise(F.lit("out")),
        )
        .withColumn("remaining", F.col("budget") - F.col("cum_before"))
    )
    tagged = perdoc.join(
        vals.select("dens", "status", "remaining", "budget"), "dens"
    )
    full = tagged.filter(F.col("status") == "full")
    wb = Window.partitionBy("dens").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        tagged.filter(F.col("status") == "boundary")
        .withColumn("cum_tok", F.sum("n_tok").over(wb))
        .filter(F.col("cum_tok") <= F.col("remaining"))
        .drop("cum_tok")
    )
    sel = full.unionByName(boundary)
    agg = sel.groupBy("source").agg(
        F.count("*").alias("n_selected"),
        F.sum("n_tok").alias("tokens_selected"),
        F.max("budget").alias("budget"),
    )
    return agg.selectExpr(
        "source",
        "n_selected",
        "tokens_selected",
        nm.half_up_spark_sql("tokens_selected", "budget", 6)
        + " AS budget_share",
    ).orderBy("source")


TOKEN_BUDGET_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
scored AS (
  SELECT doc_id,
         SUM((({md5_nibble_sql("MD5(term)", 1)} * 16
               + {md5_nibble_sql("MD5(term)", 2)}) * 37) % 101)
           AS score_int,
         COUNT(*) AS n_tok
  FROM toks GROUP BY 1
),
perdoc AS (
  SELECT d.doc_id, d.source, s.n_tok,
         CAST((s.score_int * 1000) // s.n_tok AS BIGINT) AS dens
  FROM documents d JOIN scored s USING (doc_id)
),
b AS (SELECT CAST(SUM(n_tok) // 5 AS BIGINT) AS budget FROM perdoc),
byval AS (SELECT dens, CAST(SUM(n_tok) AS BIGINT) AS tok_sum
          FROM perdoc GROUP BY 1),
vals AS (
  SELECT dens, tok_sum,
         COALESCE(SUM(tok_sum) OVER (ORDER BY dens DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cum_before,
         b.budget
  FROM byval CROSS JOIN b
),
tagged AS (
  SELECT p.doc_id, p.source, p.n_tok, p.dens, v.budget,
         CASE WHEN v.cum_before + v.tok_sum <= v.budget THEN 'full'
              WHEN v.cum_before < v.budget THEN 'boundary'
              ELSE 'out' END AS status,
         v.budget - v.cum_before AS remaining
  FROM perdoc p JOIN vals v USING (dens)
),
boundary AS (
  SELECT doc_id, source, n_tok, dens, budget FROM (
    SELECT t.*, SUM(n_tok) OVER (PARTITION BY dens ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum_tok
    FROM tagged t WHERE status = 'boundary'
  ) WHERE cum_tok <= remaining
),
sel AS (
  SELECT doc_id, source, n_tok, dens, budget
  FROM tagged WHERE status = 'full'
  UNION ALL
  SELECT doc_id, source, n_tok, dens, budget FROM boundary
),
agg AS (
  SELECT source, COUNT(*) AS n_selected,
         CAST(SUM(n_tok) AS BIGINT) AS tokens_selected,
         MAX(budget) AS budget
  FROM sel GROUP BY 1
)
SELECT source, n_selected, tokens_selected,
  {nm.half_up_duck_sql("tokens_selected", "budget", 6)} AS budget_share
FROM agg ORDER BY source
"""


# ---------------------------------------------------------------------
# 6. Duplication-discounted source shares
# ---------------------------------------------------------------------

def dup_weighted_source_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source token shares before vs after duplicate discounting:
    documents sharing a 6-token prefix fingerprint (the cheap
    canonicalization key — title/URL-style near-dup families that
    exact hashing misses at small scale) are collapsed to their
    lowest-doc_id canonical member; each source's raw token share is
    compared with its canonical-only share. Sources whose share
    drops are duplicate-inflated — the number a mixture-weight
    re-fit needs.

    Scale shape: one window keyed on the fingerprint (the dedup
    shuffle every keep-first pass already pays), one source-level
    aggregation, one broadcast total. All integers; two exact
    half-up emissions.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 6), " ")
    wk = Window.partitionBy("fp").orderBy("doc_id")
    d = (
        docs.select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
            key.alias("fp"),
        )
        .withColumn("rn", F.row_number().over(wk))
    )
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias(
            "n_canonical"
        ),
        F.sum("n_tok").alias("tokens_raw"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_tok")).otherwise(0)).alias(
            "tokens_canonical"
        ),
    )
    tot = per_src.agg(
        F.sum("tokens_raw").alias("total_raw"),
        F.sum("tokens_canonical").alias("total_canon"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n_docs",
            "n_canonical",
            "tokens_raw",
            "tokens_canonical",
            nm.half_up_spark_sql("tokens_raw", "total_raw", 6)
            + " AS share_raw",
            nm.half_up_spark_sql("tokens_canonical", "total_canon", 6)
            + " AS share_canonical",
        )
        .orderBy("source")
    )


DUP_WEIGHTED_SHARE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS n_tok,
         ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:6], ' ') AS fp
  FROM documents
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM d
),
per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         COUNT(*) FILTER (rn = 1) AS n_canonical,
         CAST(SUM(n_tok) AS BIGINT) AS tokens_raw,
         CAST(COALESCE(SUM(n_tok) FILTER (rn = 1), 0) AS BIGINT)
           AS tokens_canonical
  FROM r GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(tokens_raw) AS BIGINT) AS total_raw,
         CAST(SUM(tokens_canonical) AS BIGINT) AS total_canon
  FROM per_src
)
SELECT source, n_docs, n_canonical, tokens_raw, tokens_canonical,
  {nm.half_up_duck_sql("tokens_raw", "total_raw", 6)} AS share_raw,
  {nm.half_up_duck_sql("tokens_canonical", "total_canon", 6)}
    AS share_canonical
FROM per_src CROSS JOIN tot ORDER BY source
"""

# ---------------------------------------------------------------------
# 7. Link prediction: common neighbors / Jaccard
# ---------------------------------------------------------------------

def link_prediction_common_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction over the shared ring+chord doc graph (the
    triangle-bearing generator from plans/analytics.py
    _ring_chord_edges): for every non-adjacent node pair at distance
    2, the common-neighbor count and neighborhood Jaccard — the
    classic citation/dedup-graph "edges that should exist" score —
    top 20 by (common DESC, u, v).

    Scale shape: the standard two-hop self-join on the adjacency
    list (shuffle keyed on the middle node — the same plan triangle
    counting pays), an anti-join against existing edges, broadcastable
    degree frames, exact integer Jaccard. Top-k is a
    TakeOrderedAndProject, never a full sort.
    """
    from spark_flink_streaming_example_with_test_spark.plans.analytics import _ring_chord_edges

    edges = _ring_chord_edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg")).withColumnRenamed(
        "u", "node"
    )
    p1 = adj.select(F.col("u").alias("a"), F.col("v").alias("x"))
    p2 = adj.select(F.col("u").alias("x"), F.col("v").alias("b"))
    cand = (
        p1.join(p2, "x")
        .filter(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("u"), F.col("b").alias("v"))
        .agg(F.count("*").alias("common_neighbors"))
        .join(und, ["u", "v"], "left_anti")
    )
    degu = deg.select(F.col("node").alias("nu"), F.col("deg").alias("deg_u"))
    degv = deg.select(F.col("node").alias("nv"), F.col("deg").alias("deg_v"))
    scored = (
        cand.join(degu, F.col("u") == F.col("nu"))
        .drop("nu")
        .join(degv, F.col("v") == F.col("nv"))
        .drop("nv")
    )
    return (
        scored.selectExpr(
            "u",
            "v",
            "common_neighbors",
            "deg_u",
            "deg_v",
            nm.half_up_spark_sql(
                "common_neighbors", "deg_u + deg_v - common_neighbors", 6
            )
            + " AS jaccard",
        )
        .orderBy(F.desc("common_neighbors"), "u", "v")
        .limit(20)
    )


LINK_PREDICTION_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
fam AS (
  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst
  FROM documents CROSS JOIN n
  UNION ALL
  SELECT doc_id, (doc_id + 2) % n.n FROM documents CROSS JOIN n
  UNION ALL
  SELECT doc_id, (doc_id * 3 + 7) % n.n FROM documents CROSS JOIN n
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM fam WHERE LEAST(src, dst) < GREATEST(src, dst)
),
adj AS (
  SELECT u, v FROM und UNION ALL SELECT v, u FROM und
),
deg AS (SELECT u AS node, COUNT(*) AS deg FROM adj GROUP BY 1),
cand AS (
  SELECT p1.u AS u, p2.v AS v, COUNT(*) AS common_neighbors
  FROM adj p1 JOIN adj p2 ON p1.v = p2.u
  WHERE p1.u < p2.v
  GROUP BY 1, 2
),
nonedge AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM und e
                    WHERE e.u = c.u AND e.v = c.v)
),
scored AS (
  SELECT ne.u, ne.v, ne.common_neighbors,
         du.deg AS deg_u, dv.deg AS deg_v
  FROM nonedge ne
  JOIN deg du ON du.node = ne.u
  JOIN deg dv ON dv.node = ne.v
)
SELECT u, v, common_neighbors, deg_u, deg_v,
  {nm.half_up_duck_sql(
      "common_neighbors", "deg_u + deg_v - common_neighbors", 6)}
    AS jaccard
FROM scored
ORDER BY common_neighbors DESC, u, v
LIMIT 20
"""


# ---------------------------------------------------------------------
# 8. Retrieval evaluation: precision@10 / NDCG@10
# ---------------------------------------------------------------------

#: NDCG rank discounts as INTEGER PPM literals, generated once in
#: Python and inlined into BOTH engines' plans — 1e6/log2(rank+1)
#: rounded to the nearest integer. No libm call sits on the parity
#: path, and integer dcg/idcg sums are exact and order-independent.
NDCG_DISCOUNT_PPM: tuple[int, ...] = tuple(
    round(1_000_000 / math.log2(rk + 1)) for rk in range(1, 11)
)

_DISCOUNT_CASE_SQL = (
    "CASE rk "
    + " ".join(
        f"WHEN {rk} THEN {d}"
        for rk, d in enumerate(NDCG_DISCOUNT_PPM, start=1)
    )
    + " ELSE 0 END"
)

_IDEAL_CASE_SQL = _DISCOUNT_CASE_SQL.replace("CASE rk", "CASE irk")


def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of cosine search against the
    label ground truth: for each probe vector (vec_id < 8), the
    top-10 cosine neighbors (self excluded) are graded by label
    match; emits exact precision@10 and NDCG@10, the two numbers
    every embedding-model refresh is gated on.

    NDCG arithmetic is EXACT: rank discounts are shared integer-ppm
    literals (NDCG_DISCOUNT_PPM), relevance is binary, so dcg/idcg
    are integer sums and the final ratio is one half-up division.
    The ideal ranking reuses the same literals keyed by the
    rel-sorted rank.

    Scale shape: broadcast probe set x corpus scan (the
    hard_negative_mining plan), probe-sized windows after the top-k
    cut.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    c = sim.with_unit_prep(emb)
    q = sim.with_unit_prep(emb.filter(F.col("vec_id") < 8)).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"),
    )
    cos = _cos_ppm(
        sim.dot("v", "qv") / (F.col("v_norm") * F.col("q_norm"))
    )
    nb = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            F.when(F.col("label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("rel"),
            cos.alias("cos_ppm"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_ppm"), F.asc("vec_id")
    )
    top = nb.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 10
    )
    wi = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("rk"))
    graded = top.withColumn("irk", F.row_number().over(wi)).selectExpr(
        "q_id",
        "q_label",
        "rel",
        f"rel * ({_DISCOUNT_CASE_SQL}) AS dcg_term",
        f"rel * ({_IDEAL_CASE_SQL}) AS ideal_term",
    )
    agg = graded.groupBy("q_id", "q_label").agg(
        F.sum("rel").alias("n_rel"),
        F.count("*").alias("n_ret"),
        F.sum("dcg_term").alias("dcg_ppm"),
        F.sum("ideal_term").alias("idcg_ppm"),
    )
    return agg.selectExpr(
        "q_id",
        "q_label",
        "n_rel",
        nm.half_up_spark_sql("n_rel", "n_ret", 6) + " AS precision_at_10",
        "CASE WHEN idcg_ppm > 0 THEN "
        + nm.half_up_spark_sql("dcg_ppm", "idcg_ppm", 6)
        + " ELSE 0.0 END AS ndcg_at_10",
    ).orderBy("q_id")


RETRIEVAL_NDCG_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         SQRT(LIST_SUM(LIST_TRANSFORM(embedding::DOUBLE[], x -> x * x)))
           AS nrm
  FROM embeddings
), ez AS (
  SELECT * FROM e WHERE nrm > 0
), q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS q_nrm
  FROM ez WHERE vec_id < 8
), nb AS (
  SELECT q_id, q_label, vec_id,
         CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel,
         CAST(ROUND(ROUND(
           LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(v) + 1),
                    i -> v[i] * qv[i])) / (nrm * q_nrm), 6)
           * 1000000.0, 0) AS BIGINT) AS cos_ppm
  FROM ez CROSS JOIN q WHERE vec_id != q_id
), top AS (
  SELECT * FROM (
    SELECT q_id, q_label, vec_id, rel,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos_ppm DESC, vec_id) AS rk
    FROM nb
  ) WHERE rk <= 10
), graded AS (
  SELECT q_id, q_label, rel,
         rel * ({_DISCOUNT_CASE_SQL}) AS dcg_term,
         rel * ({_IDEAL_CASE_SQL}) AS ideal_term
  FROM (
    SELECT t.*, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY rel DESC, rk) AS irk
    FROM top t
  )
), agg AS (
  SELECT q_id, q_label,
         CAST(SUM(rel) AS BIGINT) AS n_rel,
         COUNT(*) AS n_ret,
         CAST(SUM(dcg_term) AS BIGINT) AS dcg_ppm,
         CAST(SUM(ideal_term) AS BIGINT) AS idcg_ppm
  FROM graded GROUP BY 1, 2
)
SELECT q_id, q_label, n_rel,
  {nm.half_up_duck_sql("n_rel", "n_ret", 6)} AS precision_at_10,
  CASE WHEN idcg_ppm > 0 THEN
    {nm.half_up_duck_sql("dcg_ppm", "idcg_ppm", 6)}
  ELSE 0.0 END AS ndcg_at_10
FROM agg ORDER BY q_id
"""

# ---------------------------------------------------------------------
# 9. Lexical diversity: type-token ratio per source
# ---------------------------------------------------------------------

def type_token_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level lexical-diversity profile per source: vocabulary
    size, hapax-legomena count (terms seen exactly once), total
    tokens, type-token ratio, and hapax share — the screen that
    separates template-generated sources (tiny vocab, low hapax)
    from organic text before mixture weighting. Per-document TTR
    exists in text_quality_scores; this is the corpus-level twin
    whose vocabulary does NOT decompose doc-by-doc.

    Scale shape: one (source, term) aggregation (the wordcount
    shuffle), one source-level rollup. Exact integers; two half-up
    emissions.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    freq = tok.groupBy("source", "term").agg(F.count("*").alias("c"))
    agg = freq.groupBy("source").agg(
        F.count("*").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.sum("c").alias("n_tokens"),
    )
    return agg.selectExpr(
        "source",
        "n_tokens",
        "vocab_size",
        "n_hapax",
        nm.half_up_spark_sql("vocab_size", "n_tokens", 6) + " AS ttr",
        nm.half_up_spark_sql("n_hapax", "vocab_size", 6)
        + " AS hapax_share",
    ).orderBy("source")


TYPE_TOKEN_RATIO_ORACLE = f"""
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
freq AS (
  SELECT source, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
),
agg AS (
  SELECT source, COUNT(*) AS vocab_size,
         COUNT(*) FILTER (c = 1) AS n_hapax,
         CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM freq GROUP BY 1
)
SELECT source, n_tokens, vocab_size, n_hapax,
  {nm.half_up_duck_sql("vocab_size", "n_tokens", 6)} AS ttr,
  {nm.half_up_duck_sql("n_hapax", "vocab_size", 6)} AS hapax_share
FROM agg ORDER BY source
"""


# ---------------------------------------------------------------------
# 10. Nucleus (top-p) vocabulary coverage
# ---------------------------------------------------------------------

def nucleus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) vocabulary audit per source: the minimal
    number of highest-frequency terms whose cumulative count covers
    >= 90% of the source's token mass — the number that sizes a
    domain tokenizer and flags heavy-tail sources whose text a
    shared vocab will shatter. Exact integer comparison
    (10 * cum >= 9 * total) — no float threshold.

    Scale shape: the (source, term) wordcount shuffle, then an
    ordered window over the per-source VOCABULARY frame (bounded by
    vocab size, not corpus size — the sanctioned distinct-value
    decomposition), then a two-value min/arg-min rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    freq = tok.groupBy("source", "term").agg(F.count("*").alias("c"))
    tot = freq.groupBy("source").agg(
        F.sum("c").alias("total_tokens"), F.count("*").alias("vocab_size")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), "term")
    ranked = (
        freq.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum("c").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .join(tot, "source")
        .filter(F.col("cum") * 10 >= F.col("total_tokens") * 9)
    )
    hit = ranked.groupBy("source").agg(
        F.min("rn").alias("v90_terms"),
        F.min_by("cum", "rn").alias("cum_at_v90"),
        F.max("total_tokens").alias("total_tokens"),
        F.max("vocab_size").alias("vocab_size"),
    )
    return hit.selectExpr(
        "source",
        "total_tokens",
        "vocab_size",
        "v90_terms",
        nm.half_up_spark_sql("cum_at_v90", "total_tokens", 6)
        + " AS coverage_at_v90",
        nm.half_up_spark_sql("v90_terms", "vocab_size", 6)
        + " AS v90_vocab_share",
    ).orderBy("source")


NUCLEUS_VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
freq AS (
  SELECT source, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS total_tokens,
         COUNT(*) AS vocab_size
  FROM freq GROUP BY 1
),
ranked AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, term) AS rn,
         CAST(SUM(c) OVER (PARTITION BY source
                           ORDER BY c DESC, term
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum
  FROM freq
),
hit AS (
  SELECT r.source, MIN(r.rn) AS v90_terms,
         ARG_MIN(r.cum, r.rn) AS cum_at_v90,
         MAX(t.total_tokens) AS total_tokens,
         MAX(t.vocab_size) AS vocab_size
  FROM ranked r JOIN tot t USING (source)
  WHERE r.cum * 10 >= t.total_tokens * 9
  GROUP BY 1
)
SELECT source, total_tokens, vocab_size, v90_terms,
  {nm.half_up_duck_sql("cum_at_v90", "total_tokens", 6)}
    AS coverage_at_v90,
  {nm.half_up_duck_sql("v90_terms", "vocab_size", 6)}
    AS v90_vocab_share
FROM hit ORDER BY source
"""


# ---------------------------------------------------------------------
# 11. Mutual information: source x lang
# ---------------------------------------------------------------------

def mutual_information_source_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual information I(source; lang) in nats — the single
    number summarizing how much source identity predicts language
    (0 = independent), the companion scalar to the chi-square grid.

    Float posture: each cell's term (obs/N) * ln(obs*N / (rt*ct))
    has an exact-integer ratio inside the log, so both engines call
    libm on the SAME double; the cross-cell sum is pinned to one
    association order via an ordered running window over the
    (source, lang) cell frame (marginal-sized, never corpus-sized)
    — the same pinned-order trick the NDCG family avoids needing by
    integer quantization, used here because MI terms are signed
    irrationals. Rounded ONCE at 6 dp.
    """
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("source", "lang").agg(F.count("*").alias("observed"))
    rt = docs.groupBy("source").agg(F.count("*").alias("row_tot"))
    ct = docs.groupBy("lang").agg(F.count("*").alias("col_tot"))
    tot = docs.agg(F.count("*").alias("n_total"))
    cells = (
        obs.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "term",
            (F.col("observed") / F.col("n_total"))
            * F.log(
                (F.col("observed") * F.col("n_total"))
                / (F.col("row_tot") * F.col("col_tot"))
            ),
        )
    )
    w = Window.orderBy("source", "lang")
    cum = cells.withColumn("rn", F.row_number().over(w)).withColumn(
        "cum_mi",
        F.sum("term").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return cum.groupBy().agg(
        F.count("*").alias("n_cells_nonzero"),
        F.max_by("cum_mi", "rn").alias("raw"),
    ).selectExpr(
        "n_cells_nonzero", "ROUND(raw, 6) AS mi_nats"
    )


MUTUAL_INFORMATION_ORACLE = """
WITH rt AS (SELECT source, COUNT(*) AS row_tot FROM documents GROUP BY 1),
ct AS (SELECT lang, COUNT(*) AS col_tot FROM documents GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM documents),
obs AS (SELECT source, lang, COUNT(*) AS observed
        FROM documents GROUP BY 1, 2),
cells AS (
  SELECT o.source, o.lang,
         (o.observed * 1.0 / t.n_total)
           * LN((o.observed * 1.0 * t.n_total)
                / (1.0 * rt.row_tot * ct.col_tot)) AS term
  FROM obs o
  JOIN rt ON rt.source = o.source
  JOIN ct ON ct.lang = o.lang
  CROSS JOIN tot t
),
cum AS (
  SELECT ROW_NUMBER() OVER (ORDER BY source, lang) AS rn,
         SUM(term) OVER (ORDER BY source, lang
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_mi
  FROM cells
)
SELECT COUNT(*) AS n_cells_nonzero,
       ROUND(ARG_MAX(cum_mi, rn), 6) AS mi_nats
FROM cum
"""

# ---------------------------------------------------------------------
# 12. Embedding snapshot drift (A/B centroid shift per label)
# ---------------------------------------------------------------------

def embedding_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift between two corpus snapshots, simulated by
    the even/odd vec_id halves: per label, the L2 distance between
    the two halves' centroids — the refresh-monitoring number that
    flags a label whose representation moved between embedding-model
    versions or ingest batches.

    Exactness: components are quantized to integer ppm (the
    repo-wide double-round construction), so per-(label, dim) sums
    are EXACT integers; the centroid difference per dim is the exact
    rational (se*no - so*ne) / (ne*no), its square summed as
    DECIMAL(38,0)/HUGEINT, and only the final sqrt/divide touches
    doubles (sqrt of the same integer on both engines), rounded
    once. Scale shape: one posexplode aggregation keyed
    (label, dim) — dim fan-out is the embedding width, the same
    shuffle the dim-variance query pays — then a label-sized rollup.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("even"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    ).withColumn(
        "ppm",
        F.round(F.round("x", 6) * 1_000_000.0, 0).cast("long"),
    )
    counts = (
        emb.groupBy("label")
        .agg(
            F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)).alias(
                "ne"
            ),
            F.sum(F.when(F.col("vec_id") % 2 == 0, 0).otherwise(1)).alias(
                "no"
            ),
        )
    )
    perdim = ex.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("even"), F.col("ppm")).otherwise(0)).alias("se"),
        F.sum(F.when(F.col("even"), 0).otherwise(F.col("ppm"))).alias("so"),
    )
    sq = (
        perdim.join(F.broadcast(counts), "label")
        .selectExpr(
            "label",
            "ne",
            "no",
            "CAST(se AS DECIMAL(38,0)) * no - CAST(so AS DECIMAL(38,0)) * ne"
            + " AS dnum",
        )
        .groupBy("label", "ne", "no")
        .agg(F.sum(F.expr("dnum * dnum")).alias("sumsq"))
    )
    return sq.selectExpr(
        "label",
        "ne",
        "no",
        "CASE WHEN ne * no > 0 THEN"
        " ROUND(SQRT(CAST(sumsq AS DOUBLE)) / (CAST(ne AS DOUBLE) * no), 6)"
        " ELSE 0.0 END AS drift_ppm_l2",
    ).orderBy("label")


EMBEDDING_DRIFT_ORACLE = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
counts AS (
  SELECT label,
         COUNT(*) FILTER (vec_id % 2 = 0) AS ne,
         COUNT(*) FILTER (vec_id % 2 != 0) AS no
  FROM e GROUP BY 1
),
ex AS (
  SELECT label, vec_id % 2 = 0 AS even, v,
         UNNEST(RANGE(1, LEN(v) + 1)) AS dim
  FROM e
),
px AS (
  SELECT label, even, dim,
         CAST(ROUND(ROUND(v[dim], 6) * 1000000.0, 0) AS BIGINT) AS ppm
  FROM ex
),
perdim AS (
  SELECT label, dim,
         CAST(COALESCE(SUM(ppm) FILTER (even), 0) AS HUGEINT) AS se,
         CAST(COALESCE(SUM(ppm) FILTER (NOT even), 0) AS HUGEINT) AS so
  FROM px GROUP BY 1, 2
),
sq AS (
  SELECT p.label, c.ne, c.no,
         SUM((p.se * c.no - p.so * c.ne) * (p.se * c.no - p.so * c.ne))
           AS sumsq
  FROM perdim p JOIN counts c USING (label)
  GROUP BY 1, 2, 3
)
SELECT label, ne, no,
       CASE WHEN ne * no > 0 THEN
         ROUND(SQRT(CAST(sumsq AS DOUBLE))
               / (CAST(ne AS DOUBLE) * no), 6)
       ELSE 0.0 END AS drift_ppm_l2
FROM sq ORDER BY label
"""


# ---------------------------------------------------------------------
# 13. Cohen's kappa: lang-id heuristic vs ground truth
# ---------------------------------------------------------------------

def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement (Cohen's kappa) between the
    stopword-density lang-id heuristic (operators/text.py
    predict_language; same expression as langid_confusion_matrix)
    and the ground-truth lang column coarsened to the heuristic's
    3-class space (en / latin-ish / other) — the one-number summary
    a labeling-pipeline review starts from, exact where the
    confusion matrix emits the per-cell breakdown.

    Exactness: kappa = (N*agree - sum_k rt_k*ct_k) /
    (N^2 - sum_k rt_k*ct_k) is an exact integer rational; the
    numerator can be NEGATIVE (below-chance agreement), which the
    half-up helpers exclude (div truncation vs floor divergence), so
    the sign is split out and the magnitude rounded half-up — both
    engines spell the same CASE.
    """
    from spark_flink_streaming_example_with_test_spark.operators import text as tx

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tx.tokenize(F.col("text")))
    ratio = tx.stopword_hits(F.col("text")) / n_tokens
    coarse = (
        F.when(F.col("lang") == "en", "en")
        .when(F.col("lang").isin("de", "es", "fr"), "latin-ish")
        .otherwise("other")
    )
    pred = docs.select(
        coarse.alias("truth"), tx.predict_language(ratio).alias("pred")
    )
    cells = pred.groupBy("truth", "pred").agg(F.count("*").alias("c"))
    rt = cells.groupBy("truth").agg(F.sum("c").alias("rt"))
    ct = cells.groupBy("pred").agg(F.sum("c").alias("ct"))
    chance = (
        rt.join(ct, rt.truth == ct.pred)
        .agg(F.sum(F.expr("CAST(rt AS DECIMAL(38,0)) * ct")).alias("pe_num"))
    )
    agree = cells.agg(
        F.sum(F.when(F.col("truth") == F.col("pred"), F.col("c")).otherwise(0)
              ).alias("n_agree"),
        F.sum("c").alias("n_docs"),
    )
    j = agree.crossJoin(F.broadcast(chance)).withColumn(
        "knum",
        F.expr("CAST(n_docs AS DECIMAL(38,0)) * n_agree - pe_num"),
    ).withColumn(
        "kden",
        F.expr("CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_num"),
    )
    return j.selectExpr(
        "n_docs",
        "n_agree",
        nm.half_up_spark_sql("CAST(n_agree AS DECIMAL(38,0)) * 1", "n_docs", 6)
        + " AS po",
        nm.half_up_spark_sql(
            "pe_num", "CAST(n_docs AS DECIMAL(38,0)) * n_docs", 6
        )
        + " AS pe",
        "CASE WHEN knum >= 0 THEN "
        + nm.half_up_spark_sql("knum", "kden", 6)
        + " ELSE -(" + nm.half_up_spark_sql("-knum", "kden", 6) + ")"
        + " END AS kappa",
    )


COHENS_KAPPA_ORACLE = f"""
WITH pred0 AS (
  SELECT CASE WHEN lang = 'en' THEN 'en'
              WHEN lang IN ('de', 'es', 'fr') THEN 'latin-ish'
              ELSE 'other' END AS truth,
         CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                   t -> LIST_CONTAINS(['the','a','of','and','is','to','in'], t)))
                   * 1.0 / LEN(STRING_SPLIT(text, ' ')) >= 0.12 THEN 'en'
              WHEN LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                   t -> LIST_CONTAINS(['the','a','of','and','is','to','in'], t)))
                   * 1.0 / LEN(STRING_SPLIT(text, ' ')) >= 0.04
                   THEN 'latin-ish'
              ELSE 'other' END AS pred
  FROM documents
),
cells AS (
  SELECT truth, pred, COUNT(*) AS c FROM pred0 GROUP BY 1, 2
),
rt AS (SELECT truth, CAST(SUM(c) AS BIGINT) AS rt FROM cells GROUP BY 1),
ct AS (SELECT pred, CAST(SUM(c) AS BIGINT) AS ct FROM cells GROUP BY 1),
chance AS (
  SELECT CAST(SUM(CAST(rt.rt AS HUGEINT) * ct.ct) AS HUGEINT) AS pe_num
  FROM rt JOIN ct ON rt.truth = ct.pred
),
agree AS (
  SELECT CAST(COALESCE(SUM(c) FILTER (truth = pred), 0) AS BIGINT)
           AS n_agree,
         CAST(SUM(c) AS BIGINT) AS n_docs
  FROM cells
),
j AS (
  SELECT a.n_docs, a.n_agree, ch.pe_num,
         CAST(a.n_docs AS HUGEINT) * a.n_agree - ch.pe_num AS knum,
         CAST(a.n_docs AS HUGEINT) * a.n_docs - ch.pe_num AS kden
  FROM agree a CROSS JOIN chance ch
)
SELECT n_docs, n_agree,
  {nm.half_up_duck_sql("n_agree", "n_docs", 6)} AS po,
  {nm.half_up_duck_sql("pe_num", "CAST(n_docs AS HUGEINT) * n_docs", 6)}
    AS pe,
  CASE WHEN knum >= 0 THEN
    {nm.half_up_duck_sql("knum", "kden", 6)}
  ELSE -({nm.half_up_duck_sql("-knum", "kden", 6)})
  END AS kappa
FROM j
"""

# ---------------------------------------------------------------------
# 14. Context-window overflow audit
# ---------------------------------------------------------------------

CONTEXT_WINDOWS: tuple[int, ...] = (512, 1024, 2048, 4096)


def context_window_overflow_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Truncation-loss table for candidate training context windows:
    for each window size, how many documents exceed it and what
    share of corpus tokens a truncate-at-window policy would drop —
    the table that picks the packing window before a 100 TB
    tokenization run (the complementary decision to
    pack_token_budget's padding-waste view).

    Scale shape: one per-doc token count, a 4-way literal explode
    (row growth x|windows|, constant), one 4-row aggregate, one
    broadcast total. Exact integers and half-up shares throughout.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(F.size(F.split("text", " ")).alias("n_tok"))
    tot = d.agg(
        F.sum("n_tok").alias("total_tokens"),
        F.count("*").alias("total_docs"),
    )
    arr = ", ".join(str(w) for w in CONTEXT_WINDOWS)
    per = (
        d.selectExpr("n_tok", f"explode(array({arr})) AS window_size")
        .groupBy("window_size")
        .agg(
            F.sum(F.when(F.col("n_tok") > F.col("window_size"), 1)
                  .otherwise(0)).alias("n_docs_over"),
            F.sum(F.greatest(F.col("n_tok") - F.col("window_size"),
                             F.lit(0))).alias("tokens_lost"),
        )
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "window_size",
            "n_docs_over",
            "tokens_lost",
            nm.half_up_spark_sql("n_docs_over", "total_docs", 6)
            + " AS docs_over_share",
            nm.half_up_spark_sql("tokens_lost", "total_tokens", 6)
            + " AS token_loss_share",
        )
        .orderBy("window_size")
    )


CONTEXT_WINDOW_ORACLE = f"""
WITH d AS (
  SELECT LEN(STRING_SPLIT(text, ' ')) AS n_tok FROM documents
),
tot AS (
  SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         COUNT(*) AS total_docs
  FROM d
),
per AS (
  SELECT w.window_size,
         COUNT(*) FILTER (n_tok > w.window_size) AS n_docs_over,
         CAST(COALESCE(SUM(GREATEST(n_tok - w.window_size, 0)), 0)
              AS BIGINT) AS tokens_lost
  FROM d CROSS JOIN (
    SELECT UNNEST([{", ".join(str(w) for w in CONTEXT_WINDOWS)}])
      AS window_size
  ) w
  GROUP BY 1
)
SELECT window_size, n_docs_over, tokens_lost,
  {nm.half_up_duck_sql("n_docs_over", "total_docs", 6)}
    AS docs_over_share,
  {nm.half_up_duck_sql("tokens_lost", "total_tokens", 6)}
    AS token_loss_share
FROM per CROSS JOIN tot ORDER BY window_size
"""


# ---------------------------------------------------------------------
# 15. Eval-suite capstone report
# ---------------------------------------------------------------------

def eval_suite_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-stop corpus evaluation dashboard: the module's headline
    scalars — exact AUC, Cohen's kappa, mutual information, total
    chi-square, global type-token ratio, worst per-label embedding
    drift — as (metric, value) rows. The composite every data-quality
    review starts from; expensive by composition (it reruns each
    audited plan), not by anti-pattern — the same sanctioned shape as
    dedup_method_comparison.

    The chi-square total pins its cross-cell float sum to one
    association order (the MI trick); every other value is lifted
    unchanged from its audited single-metric query.
    """
    auc = auc_mannwhitney_quality(spark, sf_dir).selectExpr(
        "'auc_en_vs_rest' AS metric", "auc AS value"
    )
    kappa = cohens_kappa_langid(spark, sf_dir).selectExpr(
        "'cohens_kappa_langid' AS metric", "kappa AS value"
    )
    mi = mutual_information_source_lang(spark, sf_dir).selectExpr(
        "'mi_source_lang_nats' AS metric", "mi_nats AS value"
    )
    drift = embedding_snapshot_drift(spark, sf_dir).agg(
        F.max("drift_ppm_l2").alias("value")
    ).selectExpr("'max_label_drift' AS metric", "value")

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    ttr = tok.agg(
        F.countDistinct("term").alias("v"), F.count("*").alias("n")
    ).selectExpr(
        "'ttr_global' AS metric",
        nm.half_up_spark_sql("v", "n", 6) + " AS value",
    )

    # Full grid including zero cells — they contribute rt*ct/N to the
    # total (same grid construction as chi_square_source_lang).
    obs = docs.groupBy("source", "lang").agg(F.count("*").alias("observed"))
    rt = docs.groupBy("source").agg(F.count("*").alias("row_tot"))
    ct = docs.groupBy("lang").agg(F.count("*").alias("col_tot"))
    tot = docs.agg(F.count("*").alias("n_total"))
    grid = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(tot))
    cells = (
        grid.join(obs, ["source", "lang"], "left")
        .fillna(0, subset=["observed"])
        .withColumn(
            "diff",
            F.col("observed") * F.col("n_total")
            - F.col("row_tot") * F.col("col_tot"),
        )
        .withColumn(
            "term",
            (F.col("diff").cast("double") * F.col("diff"))
            / (
                F.col("n_total").cast("double")
                * F.col("row_tot")
                * F.col("col_tot")
            ),
        )
    )
    w = Window.orderBy("source", "lang")
    chi2 = (
        cells.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum("term").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy()
        .agg(F.max_by("cum", "rn").alias("raw"))
        .selectExpr("'chi_square_total' AS metric", "ROUND(raw, 6) AS value")
    )
    return (
        auc.unionByName(kappa)
        .unionByName(mi)
        .unionByName(drift)
        .unionByName(ttr)
        .unionByName(chi2)
        .orderBy("metric")
    )


EVAL_SUITE_ORACLE = f"""
SELECT 'auc_en_vs_rest' AS metric, auc AS value
FROM ({AUC_MANNWHITNEY_ORACLE})
UNION ALL
SELECT 'cohens_kappa_langid', kappa FROM ({COHENS_KAPPA_ORACLE})
UNION ALL
SELECT 'mi_source_lang_nats', mi_nats FROM ({MUTUAL_INFORMATION_ORACLE})
UNION ALL
SELECT 'max_label_drift', MAX(drift_ppm_l2)
FROM ({EMBEDDING_DRIFT_ORACLE})
UNION ALL
SELECT 'ttr_global',
       {nm.half_up_duck_sql("COUNT(DISTINCT term)", "COUNT(*)", 6)}
FROM (SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
      FROM documents)
UNION ALL
SELECT 'chi_square_total', ROUND(ARG_MAX(cum, rn), 6) FROM (
  WITH rt AS (SELECT source, COUNT(*) AS row_tot
              FROM documents GROUP BY 1),
  ct AS (SELECT lang, COUNT(*) AS col_tot FROM documents GROUP BY 1),
  tot AS (SELECT COUNT(*) AS n_total FROM documents),
  obs AS (SELECT source, lang, COUNT(*) AS observed
          FROM documents GROUP BY 1, 2),
  grid AS (
    SELECT rt.source, ct.lang, rt.row_tot, ct.col_tot, tot.n_total
    FROM rt CROSS JOIN ct CROSS JOIN tot
  ),
  cells AS (
    SELECT g.source, g.lang,
           CAST(COALESCE(o.observed, 0) AS HUGEINT) * g.n_total
             - CAST(g.row_tot AS HUGEINT) * g.col_tot AS diff,
           g.row_tot, g.col_tot, g.n_total
    FROM grid g LEFT JOIN obs o
      ON o.source = g.source AND o.lang = g.lang
  )
  SELECT ROW_NUMBER() OVER (ORDER BY source, lang) AS rn,
         SUM((CAST(diff AS DOUBLE) * diff)
             / (CAST(n_total AS DOUBLE) * row_tot * col_tot))
           OVER (ORDER BY source, lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM cells
)
ORDER BY metric
"""
