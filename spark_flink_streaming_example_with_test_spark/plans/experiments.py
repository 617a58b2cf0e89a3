"""Experimentation, release, and monitoring statistics (round-12
batch): the decision layer that sits ON TOP of a curated corpus —
differentially-private release counts, sketch-based join-size
estimation, effect sizes, randomization inference, sequential
testing, variance-reduced A/B readouts, count-model diagnostics,
graph cohesion, PR-AUC evaluation, heavy-tail indices, inter-rater
agreement, and streaming drift alarms.

Every query follows the repo's cross-engine-exact emission program
(functions/numerics.py, NUMERICS.md): integer/DECIMAL arithmetic on
the hash path wherever the statistic is rational, the
sqrt/log-of-exact-integers + ROUND posture where it is not, and the
shared-literal pattern (constants generated ONCE in Python at import
and inlined into BOTH engines' plans) wherever a libm call would
otherwise sit on the parity path.

Reference parity note: the reference repo (a Kafka->Spark/Flink
streaming lab, spark/spark_streaming.py + flink/) has no analytics
of this kind; this module extends the north-star LLM-pipeline layer
the same way plans/measures.py / plans/inference.py did in rounds
9-11.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_flink_streaming_example_with_test_spark.functions import numerics as nm
from spark_flink_streaming_example_with_test_spark.functions.hashing import (
    md5_nibble,
    md5_nibble_sql,
)
from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

# ---------------------------------------------------------------------
# Shared literals (generated once here, inlined into BOTH engines —
# the NDCG/LSH shared-literal pattern, so no libm evaluation ever
# sits on the cross-engine parity path).
# ---------------------------------------------------------------------

# Laplace(b=1) inverse CDF sampled at the 256 midpoints u=(i+0.5)/256,
# in ppm. Used as a deterministic noise table: a hash picks the
# bucket, the table supplies the noise — identical in both engines.
_LAPLACE_PPM: list[int] = [
    round(
        -math.copysign(1.0, (i + 0.5) / 256.0 - 0.5)
        * math.log(1.0 - 2.0 * abs((i + 0.5) / 256.0 - 0.5))
        * 1_000_000
    )
    for i in range(256)
]
_LAPLACE_SPARK = "array(" + ",".join(str(v) for v in _LAPLACE_PPM) + ")"
_LAPLACE_DUCK = "[" + ",".join(str(v) for v in _LAPLACE_PPM) + "]"

# SPRT constants for H0: p=0.18 vs H1: p=0.22 at alpha=0.05,
# beta=0.20 — chosen to bracket the fixture's ~0.20 purchase share
# so the walk genuinely wanders. All four are ln() values in ppm.
_SPRT_P0, _SPRT_P1 = 0.18, 0.22
_SPRT_LA_PPM = round(math.log(_SPRT_P1 / _SPRT_P0) * 1e6)  # 200671
_SPRT_LB_PPM = round(
    math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e6
)  # -50010
_SPRT_UPPER_PPM = round(math.log(0.80 / 0.05) * 1e6)  # ln((1-b)/a)
_SPRT_LOWER_PPM = round(math.log(0.20 / 0.95) * 1e6)  # ln(b/(1-a))

# Page-Hinkley alarm threshold: 50 value-units, in micros.
_PH_LAMBDA_MICROS = 50_000_000

# Integer value micros: the repo-standard exact integerization of the
# 2-decimal event value (plans/inference.py:881). ONE definition —
# the SQL spelling is valid in both engines, and the Spark column
# form derives from it via F.expr so the two can never drift.
_VM_SQL = "CAST(ROUND(ROUND(value, 6) * 1000000.0, 0) AS BIGINT)"
_VM_DUCK = _VM_SQL


def _vm_col() -> F.Column:
    return F.expr(_VM_SQL)


# ---------------------------------------------------------------------
# 1. Differentially-private release histogram (shared-literal Laplace)
# ---------------------------------------------------------------------

def dp_noisy_event_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type counts released with Laplace(1/epsilon) noise
    at epsilon=1 — the smallest useful differential-privacy
    mechanism: a unit-sensitivity histogram (each event contributes
    to exactly one cell) plus per-cell Laplace noise. The noise is
    drawn DETERMINISTICALLY for replayability: md5 of the cell key
    picks one of 256 inverse-CDF midpoints from a ppm literal table
    generated once in Python and inlined into both engines (the
    LSH-plan shared-literal pattern), so the mechanism's
    *distributional* shape is real while the parity path stays
    integer-exact — no libm call in either engine.

    Scale shape: one scan, one groupBy over the (tiny) type
    dimension, per-cell O(1) noise lookup. At 100 TB the histogram
    cells stay bounded by the type cardinality, so the release costs
    exactly one partial+final aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    h = F.md5(F.concat(F.lit("dp#"), F.col("event_type")))
    bucket = md5_nibble(h, 1) * 16 + md5_nibble(h, 2)
    out = counts.withColumn("noise_bucket", bucket.cast("long"))
    return out.selectExpr(
        "event_type",
        "n_events",
        "noise_bucket",
        f"CAST(element_at({_LAPLACE_SPARK}, CAST(noise_bucket + 1 AS INT))"
        " AS BIGINT) AS noise_ppm",
        f"CAST(n_events * 1000000 + element_at({_LAPLACE_SPARK},"
        " CAST(noise_bucket + 1 AS INT)) AS BIGINT) AS dp_count_ppm",
        "CAST(1000000 AS BIGINT) AS epsilon_ppm",
    ).orderBy("event_type")


DP_NOISY_HISTOGRAM_ORACLE = f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS n_events
  FROM events GROUP BY event_type
), keyed AS (
  SELECT event_type, n_events,
         ({md5_nibble_sql("MD5('dp#' || event_type)", 1)} * 16
          + {md5_nibble_sql("MD5('dp#' || event_type)", 2)}) AS noise_bucket
  FROM counts
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(noise_bucket AS BIGINT) AS noise_bucket,
       CAST(({_LAPLACE_DUCK})[noise_bucket + 1] AS BIGINT) AS noise_ppm,
       CAST(n_events * 1000000
            + ({_LAPLACE_DUCK})[noise_bucket + 1] AS BIGINT) AS dp_count_ppm,
       CAST(1000000 AS BIGINT) AS epsilon_ppm
FROM keyed
ORDER BY event_type
"""


# ---------------------------------------------------------------------
# 2. AMS (tug-of-war) F2 sketch vs exact self-join size
# ---------------------------------------------------------------------

def ams_f2_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate the self-join size of events on user_id (= the
    second frequency moment F2 = sum over users of count^2) with a
    16-estimator AMS tug-of-war sketch, and compare against the
    exact value — the planner statistic that prices a shuffle join's
    output BEFORE running it (Alon-Matias-Szegedy '96). Each
    estimator j draws a +-1 sign per user from the parity of hex
    digit j of md5(user), accumulates X_j = sum of signs over EVENTS
    (so X_j = sum_u c_u * s_j(u)), and E[X_j^2] = F2; the estimate
    is the mean of the 16 squares.

    Scale shape: the sketch is ONE scan with 16 conditional integer
    SUMs — no explode, no shuffle wider than a 1-row combine; the
    exact side is the standard count-then-sum-of-squares groupBy.
    All arithmetic is integer (DECIMAL(38,0)/HUGEINT accumulation;
    X_j is bounded by n_events, so X_j^2 <= n^2 ~ 1e15 even at the
    256x replica scale). The md5-digit signs are pairwise-enough for
    a demonstration sketch; a production rollout would swap in a
    4-wise generator — the plan shape is identical.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.concat(F.lit("ams#"), F.col("user_id").cast("string")))
    signed = ev.select(
        "user_id",
        *[
            (F.lit(1) - (md5_nibble(h, j) % 2) * 2)
            .cast("decimal(38,0)")
            .alias(f"s{j}")
            for j in range(1, 17)
        ],
    )
    sketch = signed.agg(
        F.count("*").cast("decimal(38,0)").alias("n_events"),
        *[F.sum(f"s{j}").alias(f"x{j}") for j in range(1, 17)],
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("decimal(38,0)").alias("c"))
        .agg(
            F.count("*").cast("decimal(38,0)").alias("n_users"),
            F.sum(F.col("c") * F.col("c")).alias("f2_exact"),
        )
    )
    both = sketch.crossJoin(F.broadcast(exact))
    sq_sum = " + ".join(f"x{j} * x{j}" for j in range(1, 17))
    return both.selectExpr(
        "CAST(n_events AS BIGINT) AS n_events",
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(f2_exact AS BIGINT) AS f2_exact",
        f"CAST(({sq_sum}) * 2 + 16 AS DECIMAL(38,0)) div 32 AS f2_est",
        "CAST(("
        f"  ABS(({sq_sum}) - 16 * f2_exact) * 2000000 + 32 * f2_exact"
        ") div (2 * 32 * f2_exact) AS BIGINT) AS abs_rel_err_ppm",
    )


AMS_F2_ORACLE = f"""
WITH hashed AS (
  SELECT MD5('ams#' || CAST(user_id AS VARCHAR)) AS h FROM events
), signed AS (
  SELECT {", ".join(
      f"CAST(1 - ({md5_nibble_sql('h', j)} % 2) * 2 AS HUGEINT) AS s{j}"
      for j in range(1, 17)
  )}
  FROM hashed
), sketch AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n_events,
         {", ".join(f"SUM(s{j}) AS x{j}" for j in range(1, 17))}
  FROM signed
), exact AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n_users,
         SUM(c * c) AS f2_exact
  FROM (SELECT CAST(COUNT(*) AS HUGEINT) AS c
        FROM events GROUP BY user_id)
)
SELECT CAST(n_events AS BIGINT) AS n_events,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(f2_exact AS BIGINT) AS f2_exact,
       CAST((({" + ".join(f"x{j} * x{j}" for j in range(1, 17))}) * 2 + 16)
            // 32 AS BIGINT) AS f2_est,
       CAST((ABS(({" + ".join(f"x{j} * x{j}" for j in range(1, 17))})
                 - 16 * f2_exact) * 2000000 + 32 * f2_exact)
            // (2 * 32 * f2_exact) AS BIGINT) AS abs_rel_err_ppm
FROM sketch CROSS JOIN exact
"""


# ---------------------------------------------------------------------
# 3. Cohen's d / Hedges' g effect size (purchase vs view values)
# ---------------------------------------------------------------------

def cohens_d_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size of purchase vs view event values:
    pooled-SD Cohen's d plus the small-sample Hedges' g correction —
    the number that turns "the Welch t-test rejected" into "and the
    difference is negligible/small/medium", which is what actually
    decides whether a pipeline change ships.

    Scale shape: one scan, exact integer micro-sums and
    sum-of-squares accumulated DECIMAL(38,0)/HUGEINT (value^2 in
    micros^2 is ~2.4e17 per row; the 38-digit headroom holds past
    the 256x replica scale at ~1e33), then the spearman emission
    posture: the only doubles are CASTs of exact integers, two
    IEEE-exact sqrts, and a final ROUND(...,6) — the identical
    expression shape runs in both engines.

    r14 x2048 overflow fix: the pooled term used to combine as
    exact DECIMAL ``(n1*q1 - s1*s1)*n2 + (n2*q2 - s2*s2)*n1``,
    which reached 1.66e38 > DECIMAL(38,0) at 1.2B events (the
    fifteenth-octave find). The per-group sums of squares ss_i =
    n_i*q_i - s_i^2 stay exact DECIMAL (~1e34 at x2048, ceiling ~5
    octaves out at n_i ~ 6e9 rows); only the final cross-group
    combination is computed in doubles — CAST(ss1)*CAST(n2) +
    CAST(ss2)*CAST(n1), the same operation order in BOTH engines so
    the IEEE roundings agree bit-for-bit, and the positivity guard
    moves to the always-nonnegative exact ss_i columns.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    vm = _vm_col()
    g = ev.select(
        F.col("event_type").alias("grp"), vm.alias("vm")
    )
    agg = g.agg(
        F.sum(
            F.when(F.col("grp") == "purchase", 1).otherwise(0)
        ).cast("decimal(38,0)").alias("n1"),
        F.sum(
            F.when(F.col("grp") == "view", 1).otherwise(0)
        ).cast("decimal(38,0)").alias("n2"),
        F.sum(
            F.when(F.col("grp") == "purchase", F.col("vm")).otherwise(0)
            .cast("decimal(38,0)")
        ).alias("s1"),
        F.sum(
            F.when(F.col("grp") == "view", F.col("vm")).otherwise(0)
            .cast("decimal(38,0)")
        ).alias("s2"),
        F.sum(
            F.when(F.col("grp") == "purchase", F.col("vm")).otherwise(0)
            .cast("decimal(38,0)")
            * F.when(F.col("grp") == "purchase", F.col("vm")).otherwise(0)
        ).alias("q1"),
        F.sum(
            F.when(F.col("grp") == "view", F.col("vm")).otherwise(0)
            .cast("decimal(38,0)")
            * F.when(F.col("grp") == "view", F.col("vm")).otherwise(0)
        ).alias("q2"),
    )
    d_expr = (
        "CAST(s1 * n2 - s2 * n1 AS DOUBLE)"
        " * SQRT(CAST(n1 * n2 * (n1 + n2 - 2) AS DOUBLE))"
        " / (CAST(n1 * n2 AS DOUBLE)"
        "    * SQRT(CAST(ss1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
        "           + CAST(ss2 AS DOUBLE) * CAST(n1 AS DOUBLE)))"
    )
    guard = "n1 > 1 AND n2 > 1 AND (ss1 > 0 OR ss2 > 0)"
    return agg.selectExpr(
        "*",
        "n1 * q1 - s1 * s1 AS ss1",
        "n2 * q2 - s2 * s2 AS ss2",
    ).selectExpr(
        "CAST(n1 AS BIGINT) AS n_purchase",
        "CAST(n2 AS BIGINT) AS n_view",
        f"CASE WHEN {guard}"
        f" THEN ROUND({d_expr}, 6) ELSE 0.0 END AS cohens_d",
        f"CASE WHEN {guard}"
        f" THEN ROUND(({d_expr})"
        " * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0)), 6)"
        " ELSE 0.0 END AS hedges_g",
    )


COHENS_D_ORACLE = f"""
WITH g AS (
  SELECT event_type AS grp, {_VM_DUCK} AS vm
  FROM events WHERE event_type IN ('purchase', 'view')
), agg AS (
  SELECT
    CAST(SUM(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
    CAST(SUM(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
    SUM(CASE WHEN grp = 'purchase' THEN CAST(vm AS HUGEINT) ELSE 0 END) AS s1,
    SUM(CASE WHEN grp = 'view' THEN CAST(vm AS HUGEINT) ELSE 0 END) AS s2,
    SUM(CASE WHEN grp = 'purchase' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END)
      AS q1,
    SUM(CASE WHEN grp = 'view' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q2
  FROM g
), ss AS (
  SELECT *, n1 * q1 - s1 * s1 AS ss1, n2 * q2 - s2 * s2 AS ss2 FROM agg
)
SELECT CAST(n1 AS BIGINT) AS n_purchase,
       CAST(n2 AS BIGINT) AS n_view,
       CASE WHEN n1 > 1 AND n2 > 1 AND (ss1 > 0 OR ss2 > 0)
        THEN ROUND(CAST(s1 * n2 - s2 * n1 AS DOUBLE)
          * SQRT(CAST(n1 * n2 * (n1 + n2 - 2) AS DOUBLE))
          / (CAST(n1 * n2 AS DOUBLE)
             * SQRT(CAST(ss1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    + CAST(ss2 AS DOUBLE) * CAST(n1 AS DOUBLE))), 6)
        ELSE 0.0 END AS cohens_d,
       CASE WHEN n1 > 1 AND n2 > 1 AND (ss1 > 0 OR ss2 > 0)
        THEN ROUND(CAST(s1 * n2 - s2 * n1 AS DOUBLE)
          * SQRT(CAST(n1 * n2 * (n1 + n2 - 2) AS DOUBLE))
          / (CAST(n1 * n2 AS DOUBLE)
             * SQRT(CAST(ss1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    + CAST(ss2 AS DOUBLE) * CAST(n1 AS DOUBLE)))
          * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0)), 6)
        ELSE 0.0 END AS hedges_g
FROM ss
"""


# ---------------------------------------------------------------------
# 4. Randomization (permutation) test on user total values
# ---------------------------------------------------------------------

_PERM_R = 200  # replicates


def permutation_test_value_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the difference in mean TOTAL value
    between users who ever purchased and users who never did — the
    assumption-free alternative to the t-test, at the statistically
    correct unit (the user, not the event; event-level permutation
    would ignore within-user correlation). 200 size-preserving
    label permutations are drawn deterministically: replicate r
    ranks users by md5('perm#r#user') and assigns the top n_treat to
    the pseudo-treatment group, so group sizes match the observed
    split exactly and the whole test replays bit-identically in both
    engines.

    The statistic is kept integer-exact by cross-multiplying the
    mean difference: D = |S_treat * n_ctrl - S_ctrl * n_treat| in
    value-micros (DECIMAL(38,0)/HUGEINT), and the p-value is the
    add-one Monte Carlo estimate (1 + #{D_r >= D_obs}) / (R + 1)
    emitted via the exact half-up ppm helper.

    Scale shape: the replicate fan-out is an explode over the USER
    frame (|users| x 200 rows — at the 256x replica scale ~77M
    window rows, partitioned BY replicate so the rank never sees
    more than |users| rows per partition); the observed statistic
    rides a 1-row broadcast. No event-level blowup: events collapse
    to per-user totals first.
    """
    ev = load_table(spark, sf_dir, "events")
    vm = _vm_col()
    users = ev.groupBy("user_id").agg(
        F.sum(vm).cast("decimal(38,0)").alias("tot_vm"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("is_treat"),
    )
    obs = users.agg(
        F.count("*").cast("decimal(38,0)").alias("n_users"),
        F.sum("is_treat").cast("decimal(38,0)").alias("n_treat"),
        F.sum(F.when(F.col("is_treat") == 1, F.col("tot_vm")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s_treat"),
        F.sum("tot_vm").cast("decimal(38,0)").alias("s_tot"),
    ).selectExpr(
        "n_users",
        "n_treat",
        "ABS(s_treat * (n_users - n_treat) - (s_tot - s_treat) * n_treat)"
        " AS d_obs",
    )
    reps = users.select(
        "user_id",
        "tot_vm",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_R - 1))).alias("rep"),
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.lit("perm#"),
                F.col("rep").cast("string"),
                F.lit("#"),
                F.col("user_id").cast("string"),
            )
        ),
    )
    w = Window.partitionBy("rep").orderBy("h", "user_id")
    flagged = reps.withColumn("rn", F.row_number().over(w))
    per_rep = (
        flagged.crossJoin(F.broadcast(obs))
        .groupBy("rep")
        .agg(
            F.sum(
                F.when(
                    F.col("rn") <= F.col("n_treat"), F.col("tot_vm")
                ).otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("s_t"),
            F.max("n_users").alias("n_users"),
            F.max("n_treat").alias("n_treat"),
            F.max("d_obs").alias("d_obs"),
            F.sum("tot_vm").cast("decimal(38,0)").alias("s_tot"),
        )
        .selectExpr(
            "n_users",
            "n_treat",
            "d_obs",
            "CASE WHEN ABS(s_t * (n_users - n_treat)"
            "              - (s_tot - s_t) * n_treat) >= d_obs"
            " THEN 1 ELSE 0 END AS extreme",
        )
    )
    return per_rep.groupBy("n_users", "n_treat", "d_obs").agg(
        F.count("*").alias("r_replicates"),
        F.sum("extreme").alias("n_extreme"),
    ).selectExpr(
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(n_treat AS BIGINT) AS n_treat",
        # r13 (ADVICE): d_obs grows as (user count x total value
        # micros) and would pass int64 around the ~1000x replica
        # octave, where Spark's non-ANSI decimal->long cast NULLs
        # silently while DuckDB's HUGEINT->BIGINT raises. Emit at
        # whole-value-unit scale (exact floor-div by 1e6 on the
        # non-negative statistic; `div` truncates, `//` floors —
        # identical for >= 0), which defers the ceiling to ~1e12
        # user-value-units, far past any planned octave. The
        # internal >= comparison stays at full micro precision.
        "CAST(d_obs div 1000000 AS BIGINT) AS d_obs_value_units",
        "CAST(r_replicates AS BIGINT) AS r_replicates",
        "CAST(n_extreme AS BIGINT) AS n_extreme",
        nm.half_up_scaled_spark_sql(
            "CAST(1 + n_extreme AS DECIMAL(38,0))",
            "r_replicates + 1",
            6,
        )
        + " AS p_value_ppm",
    )


PERMUTATION_TEST_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST(SUM({_VM_DUCK}) AS HUGEINT) AS tot_vm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS is_treat
  FROM events GROUP BY user_id
), obs AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n_users,
         CAST(SUM(is_treat) AS HUGEINT) AS n_treat,
         ABS(SUM(CASE WHEN is_treat = 1 THEN tot_vm ELSE 0 END)
               * (COUNT(*) - SUM(is_treat))
             - SUM(CASE WHEN is_treat = 0 THEN tot_vm ELSE 0 END)
               * SUM(is_treat)) AS d_obs
  FROM users
), reps AS (
  SELECT u.user_id, u.tot_vm, r.rep,
         MD5('perm#' || CAST(r.rep AS VARCHAR) || '#'
             || CAST(u.user_id AS VARCHAR)) AS h
  FROM users u
  CROSS JOIN (SELECT UNNEST(RANGE(0, {_PERM_R})) AS rep) r
), flagged AS (
  SELECT rep, tot_vm,
         ROW_NUMBER() OVER (PARTITION BY rep ORDER BY h, user_id) AS rn
  FROM reps
), per_rep AS (
  SELECT rep,
         CASE WHEN ABS(
           SUM(CASE WHEN rn <= (SELECT n_treat FROM obs)
               THEN tot_vm ELSE 0 END)
             * ((SELECT n_users FROM obs) - (SELECT n_treat FROM obs))
           - SUM(CASE WHEN rn > (SELECT n_treat FROM obs)
                 THEN tot_vm ELSE 0 END)
             * (SELECT n_treat FROM obs)) >= (SELECT d_obs FROM obs)
         THEN 1 ELSE 0 END AS extreme
  FROM flagged GROUP BY rep
)
SELECT CAST(o.n_users AS BIGINT) AS n_users,
       CAST(o.n_treat AS BIGINT) AS n_treat,
       CAST(o.d_obs // 1000000 AS BIGINT) AS d_obs_value_units,
       CAST(COUNT(*) AS BIGINT) AS r_replicates,
       CAST(SUM(p.extreme) AS BIGINT) AS n_extreme,
       {nm.half_up_scaled_duck_sql(
           "1 + SUM(p.extreme)", "COUNT(*) + 1", 6
       )} AS p_value_ppm
FROM per_rep p CROSS JOIN obs o
GROUP BY o.n_users, o.n_treat, o.d_obs
"""


# ---------------------------------------------------------------------
# 5. SPRT sequential conversion monitor
# ---------------------------------------------------------------------

def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the daily
    purchase share: H0 p=0.18 vs H1 p=0.22 at alpha=0.05, beta=0.20
    — the sequential decision rule that lets a 100 TB pipeline stop
    ingesting/flagging a source the DAY the evidence crosses a
    boundary instead of waiting for a fixed horizon. Each day adds
    n_purchases * ln(p1/p0) + n_others * ln((1-p1)/(1-p0)) to the
    cumulative log-likelihood ratio; crossing ln((1-beta)/alpha)
    accepts H1, crossing ln(beta/(1-alpha)) accepts H0.

    All four log constants are Python-generated ppm literals inlined
    into both engines (shared-literal pattern), so the whole walk is
    exact integer arithmetic — the parity hash never sees a libm
    call or a float sum.

    Scale shape: events collapse to the per-day frame (tens of
    rows) in one aggregate; the cumulative window runs on that value
    frame, the established unpartitioned-window-on-compacted-frame
    pattern.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchases"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = days.withColumn(
        "cum_llr_ppm",
        F.sum(
            F.col("n_purchases") * F.lit(_SPRT_LA_PPM)
            + (F.col("n_events") - F.col("n_purchases"))
            * F.lit(_SPRT_LB_PPM)
        ).over(w),
    )
    return walked.selectExpr(
        "day",
        "n_events",
        "n_purchases",
        "CAST(cum_llr_ppm AS BIGINT) AS cum_llr_ppm",
        f"CASE WHEN cum_llr_ppm >= {_SPRT_UPPER_PPM} THEN 'accept_h1'"
        f" WHEN cum_llr_ppm <= {_SPRT_LOWER_PPM} THEN 'accept_h0'"
        " ELSE 'continue' END AS decision",
    ).orderBy("day")


SPRT_ORACLE = f"""
WITH days AS (
  SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS n_purchases
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), walked AS (
  SELECT day, n_events, n_purchases,
         SUM(n_purchases * {_SPRT_LA_PPM}
             + (n_events - n_purchases) * ({_SPRT_LB_PPM}))
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum_llr_ppm
  FROM days
)
SELECT day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(cum_llr_ppm AS BIGINT) AS cum_llr_ppm,
       CASE WHEN cum_llr_ppm >= {_SPRT_UPPER_PPM} THEN 'accept_h1'
            WHEN cum_llr_ppm <= {_SPRT_LOWER_PPM} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM walked
ORDER BY day
"""


# ---------------------------------------------------------------------
# 6. CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------

def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data,
    Deng et al. WSDM'13): split the fixture's time range at its
    midpoint into a pre/post period, take each user's post-period
    value sum as the metric Y and pre-period sum as the covariate X,
    assign a deterministic pseudo-treatment (even user_id), and
    report the theta = cov(X,Y)/var(X) adjustment, the raw and
    CUPED-adjusted treatment-control differences, and the achieved
    variance reduction rho^2 — the standard ~30-50% sample-size
    saving every experimentation platform applies before reading an
    A/B test.

    Scale shape: events collapse to one row per user (two
    conditional sums) in a single scan + one groupBy; all moment
    sums accumulate DECIMAL(38,0)/HUGEINT exactly; the time midpoint
    rides a 1-row broadcast. Emissions follow the spearman posture —
    doubles appear only as CASTs of exact integers into one shared
    expression shape, rounded once at 6.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    vm = _vm_col()
    base = ev.select("user_id", F.unix_micros("ts").alias("us"), vm.alias("vm"))
    # integer `div`, NOT `/2`+cast: Spark CAST(double AS BIGINT)
    # truncates while DuckDB's rounds (verify-skill gotcha); both
    # operands are non-negative so div == floor-divide on both sides
    bounds = base.agg(
        F.min("us").alias("mn"), F.max("us").alias("mx")
    ).selectExpr("(mn + mx) div 2 AS mid_us")
    per_user = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") <= F.col("mid_us"), F.col("vm")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("x"),
            F.sum(F.when(F.col("us") > F.col("mid_us"), F.col("vm")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("y"),
        )
        .withColumn("treat", (F.col("user_id") % 2 == 0).cast("int"))
    )
    agg = per_user.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("treat").cast("decimal(38,0)").alias("nt"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.when(F.col("treat") == 1, F.col("x")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("sxt"),
        F.sum(F.when(F.col("treat") == 1, F.col("y")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("syt"),
    )
    theta = (
        "CAST(n * sxy - sx * sy AS DOUBLE)"
        " / CAST(n * sxx - sx * sx AS DOUBLE)"
    )
    raw_diff = (
        "(CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)"
        " - CAST(sy - syt AS DOUBLE) / CAST(n - nt AS DOUBLE)) / 1e6"
    )
    x_diff = (
        "(CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)"
        " - CAST(sx - sxt AS DOUBLE) / CAST(n - nt AS DOUBLE)) / 1e6"
    )
    guard = (
        "n > 1 AND nt > 0 AND nt < n AND n * sxx - sx * sx > 0"
        " AND n * syy - sy * sy > 0"
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_users",
        "CAST(nt AS BIGINT) AS n_treat",
        f"CASE WHEN {guard} THEN ROUND({theta}, 6) ELSE 0.0 END AS theta",
        f"CASE WHEN {guard} THEN ROUND({raw_diff}, 6)"
        " ELSE 0.0 END AS raw_diff",
        f"CASE WHEN {guard} THEN"
        f" ROUND({raw_diff} - ({theta}) * ({x_diff}), 6)"
        " ELSE 0.0 END AS cuped_adjusted_diff",
        # r13 (ADVICE): r^2 = cov^2/(varx*vary) squared as one exact
        # IEEE double multiply — POWER routes through libm pow, which
        # is not correctly-rounded and can differ JVM-vs-DuckDB by
        # 1 ULP before the ROUND; d*d, * and / are all IEEE-exact.
        f"CASE WHEN {guard} THEN"
        " ROUND((CAST(n * sxy - sx * sy AS DOUBLE)"
        "        * CAST(n * sxy - sx * sy AS DOUBLE))"
        "  / (CAST(n * sxx - sx * sx AS DOUBLE)"
        "     * CAST(n * syy - sy * sy AS DOUBLE)), 6)"
        " ELSE 0.0 END AS var_reduction_r2",
    )


CUPED_ORACLE = f"""
WITH base AS (
  SELECT user_id, CAST(FLOOR(EPOCH_US(ts)) AS BIGINT) AS us,
         {_VM_DUCK} AS vm
  FROM events WHERE ts IS NOT NULL
), bounds AS (
  SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM base
), per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN us <= (SELECT mid_us FROM bounds)
                  THEN vm ELSE 0 END) AS HUGEINT) AS x,
         CAST(SUM(CASE WHEN us > (SELECT mid_us FROM bounds)
                  THEN vm ELSE 0 END) AS HUGEINT) AS y,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat
  FROM base GROUP BY user_id
), agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(treat) AS HUGEINT) AS nt,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy,
         CAST(SUM(CASE WHEN treat = 1 THEN x ELSE 0 END) AS HUGEINT) AS sxt,
         CAST(SUM(CASE WHEN treat = 1 THEN y ELSE 0 END) AS HUGEINT) AS syt
  FROM per_user
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(nt AS BIGINT) AS n_treat,
       CASE WHEN n > 1 AND nt > 0 AND nt < n AND n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0
        THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE), 6)
        ELSE 0.0 END AS theta,
       CASE WHEN n > 1 AND nt > 0 AND nt < n AND n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0
        THEN ROUND((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
                    - CAST(sy - syt AS DOUBLE) / CAST(n - nt AS DOUBLE))
                   / 1e6, 6)
        ELSE 0.0 END AS raw_diff,
       CASE WHEN n > 1 AND nt > 0 AND nt < n AND n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0
        THEN ROUND((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
                    - CAST(sy - syt AS DOUBLE) / CAST(n - nt AS DOUBLE))
                   / 1e6
                   - (CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE))
                     * ((CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)
                         - CAST(sx - sxt AS DOUBLE)
                           / CAST(n - nt AS DOUBLE)) / 1e6), 6)
        ELSE 0.0 END AS cuped_adjusted_diff,
       CASE WHEN n > 1 AND nt > 0 AND nt < n AND n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0
        THEN ROUND((CAST(n * sxy - sx * sy AS DOUBLE)
                    * CAST(n * sxy - sx * sy AS DOUBLE))
          / (CAST(n * sxx - sx * sx AS DOUBLE)
             * CAST(n * syy - sy * sy AS DOUBLE)), 6)
        ELSE 0.0 END AS var_reduction_r2
FROM agg
"""

# ---------------------------------------------------------------------
# 7. Overdispersion (variance-to-mean ratio) of daily counts by type
# ---------------------------------------------------------------------

def overdispersion_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) of DAILY event
    counts per event type, over the complete day x type grid
    (zero-count days included — dropping them biases the variance
    down, the classic mistake). VMR ~ 1 means Poisson arrivals; >> 1
    means bursty/overdispersed traffic that needs a negative
    binomial model and wider anomaly bands. Pure counting, so the
    whole statistic is rational: VMR = (D*sum(c^2) - N^2) / ((D-1)*N)
    emitted with the exact half-up ppm helpers; no float ever.

    Scale shape: events collapse to the day x type count frame (one
    aggregate); the complete grid is a broadcast cross of the two
    TINY distinct frames (days x types — bounded by calendar x
    catalog, not data volume) left-joined back, then one aggregate
    per type over D rows.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    day_counts = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("c"))
    days = day_counts.select("day").distinct()
    types = day_counts.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    full = grid.join(day_counts, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("c", F.lit(0)).alias("c")
    )
    agg = full.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("d"),
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("q"),
    )
    return agg.selectExpr(
        "event_type",
        "CAST(d AS BIGINT) AS n_days",
        "CAST(n AS BIGINT) AS n_events",
        nm.half_up_scaled_spark_sql("n", "d", 6) + " AS mean_daily_ppm",
        "CASE WHEN d > 1 THEN "
        + nm.half_up_scaled_spark_sql("d * q - n * n", "d * (d - 1)", 6)
        + " ELSE CAST(0 AS BIGINT) END AS var_daily_ppm",
        "CASE WHEN d > 1 AND n > 0 THEN "
        + nm.half_up_scaled_spark_sql("d * q - n * n", "(d - 1) * n", 6)
        + " ELSE CAST(0 AS BIGINT) END AS vmr_ppm",
    ).orderBy("event_type")


OVERDISPERSION_ORACLE = f"""
WITH day_counts AS (
  SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         event_type, COUNT(*) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), grid AS (
  SELECT d.day, t.event_type
  FROM (SELECT DISTINCT day FROM day_counts) d
  CROSS JOIN (SELECT DISTINCT event_type FROM day_counts) t
), filled AS (
  SELECT g.day, g.event_type, COALESCE(dc.c, 0) AS c
  FROM grid g LEFT JOIN day_counts dc
    ON g.day = dc.day AND g.event_type = dc.event_type
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS d,
         CAST(SUM(c) AS HUGEINT) AS n,
         SUM(CAST(c AS HUGEINT) * c) AS q
  FROM filled GROUP BY event_type
)
SELECT event_type,
       CAST(d AS BIGINT) AS n_days,
       CAST(n AS BIGINT) AS n_events,
       {nm.half_up_scaled_duck_sql("n", "d", 6)} AS mean_daily_ppm,
       CASE WHEN d > 1 THEN
         {nm.half_up_scaled_duck_sql("d * q - n * n", "d * (d - 1)", 6)}
       ELSE 0 END AS var_daily_ppm,
       CASE WHEN d > 1 AND n > 0 THEN
         {nm.half_up_scaled_duck_sql("d * q - n * n", "(d - 1) * n", 6)}
       ELSE 0 END AS vmr_ppm
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------
# 8. Local clustering coefficient histogram (ring+chord doc graph)
# ---------------------------------------------------------------------

def local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient C_i = 2*T_i /
    (deg_i * (deg_i - 1)) over the shared ring+chord doc-link graph,
    emitted as a histogram (coefficient value in exact half-up ppm x
    node count) — the cohesion profile that separates a crawl
    frontier (C ~ 0) from a citation core (C high), completing the
    graph-audit family's triangle counts with the per-node
    normalization. Nodes of degree < 2 have C = 0 by convention.

    Scale shape: the canonical undirected edge frame is computed
    ONCE and persisted (registered with the sweep-wide unpersist
    hook) because it has five consumers — the three compact-forward
    triangle join legs (operators/graph.py:158's a<b<c shape, two
    equi-joins) and the two degree orientations; without the persist
    the whole doc-scan -> edge-gen pipeline re-ran per consumer (30
    parquet scans observed at fixture scale — the exact
    re-computation class the r11 capstone fix retired). The
    coefficient is a per-node rational -> exact ppm, and the
    histogram groupBy runs on the node frame.
    """
    from pyspark import StorageLevel

    from spark_flink_streaming_example_with_test_spark.functions.persistence import register
    from spark_flink_streaming_example_with_test_spark.plans.analytics import (
        _ring_chord_edges,
    )

    edges = _ring_chord_edges(spark, sf_dir)
    und = register(
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri_nodes = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = deg.join(
        tri_nodes.withColumnRenamed("node", "u"), "u", "left"
    ).select(
        "u",
        "deg",
        F.coalesce("n_triangles", F.lit(0)).alias("t"),
    )
    cc = nodes.selectExpr(
        "u",
        "CASE WHEN deg >= 2 THEN "
        + nm.half_up_scaled_spark_sql("2 * t", "deg * (deg - 1)", 6)
        + " ELSE CAST(0 AS BIGINT) END AS cc_ppm",
    )
    return (
        cc.groupBy("cc_ppm")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("cc_ppm")
    )


LOCAL_CLUSTERING_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
fam AS (
  SELECT doc_id AS src, (doc_id + 1) % n.n AS dst FROM documents CROSS JOIN n
  UNION ALL
  SELECT doc_id, (doc_id + 2) % n.n FROM documents CROSS JOIN n
  UNION ALL
  SELECT doc_id, (doc_id * 3 + 7) % n.n FROM documents CROSS JOIN n
), und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM fam WHERE LEAST(src, dst) < GREATEST(src, dst)
), adj AS (
  SELECT u, v FROM und UNION ALL SELECT v, u FROM und
), deg AS (
  SELECT u, COUNT(*) AS deg FROM adj GROUP BY u
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
), corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
), tcount AS (
  SELECT node, COUNT(*) AS t FROM corners GROUP BY node
), nodes AS (
  SELECT d.u, d.deg, COALESCE(tc.t, 0) AS t
  FROM deg d LEFT JOIN tcount tc ON d.u = tc.node
), cc AS (
  SELECT u,
         CASE WHEN deg >= 2 THEN
           {nm.half_up_scaled_duck_sql("2 * t", "deg * (deg - 1)", 6)}
         ELSE 0 END AS cc_ppm
  FROM nodes
)
SELECT CAST(cc_ppm AS BIGINT) AS cc_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM cc GROUP BY cc_ppm
ORDER BY cc_ppm
"""


# ---------------------------------------------------------------------
# 9. PR-AUC (average precision) of the hashed-token quality signal
# ---------------------------------------------------------------------

def pr_auc_quality_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC) of the SAME integer quality score
    and lang='en' label that auc_mannwhitney_quality evaluates — the
    companion metric that ROC-AUC hides under class imbalance, which
    is the regime every quality filter on a 100 TB corpus actually
    runs in (a few percent positives). Tied scores are handled as
    atomic blocks: AP = sum over score blocks (descending) of
    delta_TP_b * precision_at_block_end_b / n_pos.

    Cross-engine exactness: each block's precision is quantized to
    ppm with the exact half-up helper BEFORE the sum, so the
    accumulated value is an INTEGER in both engines (the emitted
    metric is "AP with per-block ppm quantization" — within
    n_blocks * 5e-7 of the real AP and bit-stable), then one final
    half-up division by n_pos. The O(n^2) ranking collapses to the
    score-value frame (bounded by score cardinality), the same
    sanctioned shape as the AUC/KS family.
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
    wnd = Window.orderBy(F.col("score_int").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = byscore.withColumn(
        "cum_tp", F.sum("np").over(wnd)
    ).withColumn("cum_fp", F.sum("nn").over(wnd))
    terms = cum.selectExpr(
        "np",
        "nn",
        "CASE WHEN np > 0 THEN "
        + nm.half_up_scaled_spark_sql(
            "CAST(np AS DECIMAL(38,0)) * cum_tp", "cum_tp + cum_fp", 6
        )
        + " ELSE CAST(0 AS BIGINT) END AS term_ppm",
    )
    agg = terms.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.count("*").alias("n_score_blocks"),
        F.sum("term_ppm").alias("t_sum"),
    )
    return agg.selectExpr(
        "CAST(n_pos AS BIGINT) AS n_pos",
        "CAST(n_neg AS BIGINT) AS n_neg",
        "CAST(n_score_blocks AS BIGINT) AS n_score_blocks",
        "CASE WHEN n_pos > 0 THEN "
        "CAST((CAST(t_sum AS DECIMAL(38,0)) * 2 + n_pos)"
        " div (2 * n_pos) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS avg_precision_ppm",
        "CASE WHEN n_pos + n_neg > 0 THEN "
        + nm.half_up_scaled_spark_sql(
            "CAST(n_pos AS DECIMAL(38,0))", "n_pos + n_neg", 6
        )
        + " ELSE CAST(0 AS BIGINT) END AS prevalence_ppm",
    )


PR_AUC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
), perdoc AS (
  SELECT doc_id, lang,
         SUM((({md5_nibble_sql("MD5(term)", 1)} * 16
               + {md5_nibble_sql("MD5(term)", 2)}) * 37) % 101) AS score_int
  FROM toks GROUP BY doc_id, lang
), byscore AS (
  SELECT score_int,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
         SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
  FROM perdoc GROUP BY score_int
), cum AS (
  SELECT np, nn,
         SUM(np) OVER (ORDER BY score_int DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tp,
         SUM(nn) OVER (ORDER BY score_int DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_fp
  FROM byscore
), terms AS (
  SELECT np, nn,
         CASE WHEN np > 0 THEN
           {nm.half_up_scaled_duck_sql(
               "CAST(np AS HUGEINT) * cum_tp", "cum_tp + cum_fp", 6
           )}
         ELSE 0 END AS term_ppm
  FROM cum
), agg AS (
  SELECT CAST(SUM(np) AS HUGEINT) AS n_pos,
         CAST(SUM(nn) AS HUGEINT) AS n_neg,
         CAST(COUNT(*) AS HUGEINT) AS n_score_blocks,
         CAST(SUM(term_ppm) AS HUGEINT) AS t_sum
  FROM terms
)
SELECT CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(n_score_blocks AS BIGINT) AS n_score_blocks,
       CASE WHEN n_pos > 0 THEN
         CAST((t_sum * 2 + n_pos) // (2 * n_pos) AS BIGINT)
       ELSE 0 END AS avg_precision_ppm,
       CASE WHEN n_pos + n_neg > 0 THEN
         {nm.half_up_scaled_duck_sql("n_pos", "n_pos + n_neg", 6)}
       ELSE 0 END AS prevalence_ppm
FROM agg
"""


# ---------------------------------------------------------------------
# 10. Hill tail-index estimator on event values
# ---------------------------------------------------------------------

_HILL_K = 500


def hill_tail_index_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over the top-500
    event values: alpha_hat = k / sum_{i<=k} (ln x_(i) - ln x_(k+1))
    — the number that says whether per-item cost/value has finite
    variance (alpha > 2) or a single record can dominate a 100 TB
    aggregate (alpha <= 2), which decides winsorization policy.

    Cross-engine exactness: each ln(value_micros) is quantized to an
    INTEGER ppm immediately (one libm call per retained row, never
    summed as floats — a 1-ULP libm difference only matters if the
    true value sits within a ULP of a half-ppm boundary, measure ~
    1e-10 per row vs certain order-dependence for a 500-term float
    sum), so the log-sum and the final half-up ratio are exact
    integers in both engines.

    Scale shape: the top-(k+1) selection is a global TakeOrdered
    (Spark pushes the limit to each partition, then merges k+1 per
    partition — no full sort), and everything after runs on a
    501-row frame; flat cost in corpus size by construction.
    """
    ev = load_table(spark, sf_dir, "events")
    vm = _vm_col()
    vals = ev.select(vm.alias("vm"), "event_id").filter(F.col("vm") > 0)
    top = vals.orderBy(
        F.col("vm").desc(), F.col("event_id").asc()
    ).limit(_HILL_K + 1)
    w = Window.orderBy(F.col("vm").desc(), F.col("event_id").asc())
    ranked = top.withColumn("rn", F.row_number().over(w)).withColumn(
        "ln_ppm",
        F.round(F.log(F.col("vm").cast("double")) * 1_000_000.0, 0)
        .cast("long"),
    )
    # two-step: bring the boundary row alongside the tail sum
    kth = ranked.agg(F.max("rn").alias("max_rn")).selectExpr(
        "max_rn", "max_rn - 1 AS k_eff"
    )
    joined = ranked.crossJoin(F.broadcast(kth))
    stats = joined.agg(
        F.max("k_eff").alias("k_eff"),
        F.sum(
            F.when(F.col("rn") <= F.col("k_eff"), F.col("ln_ppm")).otherwise(0)
        ).alias("lsum_ppm"),
        F.max(
            F.when(F.col("rn") == F.col("max_rn"), F.col("ln_ppm"))
        ).alias("ln_k1_ppm"),
        F.max(
            F.when(F.col("rn") == F.col("max_rn"), F.col("vm"))
        ).alias("x_k1_micros"),
    )
    return stats.selectExpr(
        "CAST(k_eff AS BIGINT) AS k_tail",
        "CAST(x_k1_micros AS BIGINT) AS x_boundary_micros",
        "CAST(lsum_ppm - k_eff * ln_k1_ppm AS BIGINT) AS log_excess_sum_ppm",
        "CASE WHEN k_eff > 0 AND lsum_ppm - k_eff * ln_k1_ppm > 0 THEN "
        "CAST((CAST(k_eff AS DECIMAL(38,0)) * 1000000000000 * 2"
        "      + (lsum_ppm - k_eff * ln_k1_ppm))"
        " div (2 * (lsum_ppm - k_eff * ln_k1_ppm)) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS hill_alpha_ppm",
    )


HILL_ORACLE = f"""
WITH vals AS (
  SELECT {_VM_DUCK} AS vm, event_id
  FROM events
  WHERE {_VM_DUCK} > 0
), top AS (
  SELECT vm, event_id,
         ROW_NUMBER() OVER (ORDER BY vm DESC, event_id ASC) AS rn
  FROM vals
  ORDER BY vm DESC, event_id ASC
  LIMIT {_HILL_K + 1}
), lns AS (
  SELECT rn, vm,
         CAST(ROUND(LN(CAST(vm AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
           AS ln_ppm,
         MAX(rn) OVER () AS max_rn
  FROM top
), stats2 AS (
  SELECT CAST(MAX(max_rn) - 1 AS HUGEINT) AS k_eff,
         CAST(SUM(CASE WHEN rn < max_rn THEN ln_ppm ELSE 0 END)
              AS HUGEINT) AS lsum_ppm,
         CAST(MAX(CASE WHEN rn = max_rn THEN ln_ppm END) AS HUGEINT)
           AS ln_k1_ppm,
         MAX(CASE WHEN rn = max_rn THEN vm END) AS x_k1_micros
  FROM lns
)
SELECT CAST(k_eff AS BIGINT) AS k_tail,
       CAST(x_k1_micros AS BIGINT) AS x_boundary_micros,
       CAST(lsum_ppm - k_eff * ln_k1_ppm AS BIGINT) AS log_excess_sum_ppm,
       CASE WHEN k_eff > 0 AND lsum_ppm - k_eff * ln_k1_ppm > 0 THEN
         CAST((k_eff * 1000000000000 * 2
               + (lsum_ppm - k_eff * ln_k1_ppm))
              // (2 * (lsum_ppm - k_eff * ln_k1_ppm)) AS BIGINT)
       ELSE 0 END AS hill_alpha_ppm
FROM stats2
"""


# ---------------------------------------------------------------------
# 11. Krippendorff's alpha between the two quality filters
# ---------------------------------------------------------------------

def krippendorff_alpha_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal data, two raters, no missing
    values) for the SAME two paired quality filters the McNemar test
    compares (n_chars >= 300 vs >= 55 whitespace tokens) — the
    chance-corrected agreement coefficient that generalizes
    Cohen's kappa and is the lingua franca of annotation-quality
    reporting. For binary two-rater data it reduces to the closed
    form alpha = 1 - D*(2N-1) / (n0*n1), with D the count of
    disagreeing documents and n0/n1 the pooled value frequencies
    over all 2N ratings — all integers, so the statistic is one
    exact rational emitted via CAST-to-double of exact integers +
    ROUND(...,6) (sign can be negative, so the signed-safe
    assortativity posture rather than half-up).

    Scale shape: one scan, one 4-way conditional aggregate —
    identical to the McNemar plan.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    flags = docs.select(
        (F.col("n_chars") >= 300).alias("a"),
        (F.size(F.split(F.lower("text"), " ")) >= 55).alias("b"),
    )
    agg = flags.agg(
        F.count("*").cast("decimal(38,0)").alias("n_docs"),
        F.sum(F.expr("CASE WHEN a != b THEN 1 ELSE 0 END"))
        .cast("decimal(38,0)")
        .alias("n_disagree"),
        F.sum(
            F.expr(
                "CASE WHEN a THEN 1 ELSE 0 END"
                " + CASE WHEN b THEN 1 ELSE 0 END"
            )
        )
        .cast("decimal(38,0)")
        .alias("n_true_ratings"),
    )
    return agg.selectExpr(
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_disagree AS BIGINT) AS n_disagree",
        "CAST(n_true_ratings AS BIGINT) AS n_true_ratings",
        "CASE WHEN n_true_ratings > 0"
        " AND n_true_ratings < 2 * n_docs THEN"
        " ROUND(1.0 - CAST(n_disagree * (2 * n_docs - 1) AS DOUBLE)"
        "  / CAST(n_true_ratings * (2 * n_docs - n_true_ratings)"
        "         AS DOUBLE), 6)"
        " ELSE 0.0 END AS krippendorff_alpha",
    )


KRIPPENDORFF_ORACLE = """
WITH flags AS (
  SELECT (n_chars >= 300) AS a,
         (LEN(STRING_SPLIT(LOWER(text), ' ')) >= 55) AS b
  FROM documents WHERE text IS NOT NULL
), agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n_docs,
         CAST(SUM(CASE WHEN a != b THEN 1 ELSE 0 END) AS HUGEINT)
           AS n_disagree,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END
                  + CASE WHEN b THEN 1 ELSE 0 END) AS HUGEINT)
           AS n_true_ratings
  FROM flags
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_disagree AS BIGINT) AS n_disagree,
       CAST(n_true_ratings AS BIGINT) AS n_true_ratings,
       CASE WHEN n_true_ratings > 0
            AND n_true_ratings < 2 * n_docs THEN
         ROUND(1.0 - CAST(n_disagree * (2 * n_docs - 1) AS DOUBLE)
           / CAST(n_true_ratings * (2 * n_docs - n_true_ratings)
                  AS DOUBLE), 6)
       ELSE 0.0 END AS krippendorff_alpha
FROM agg
"""


# ---------------------------------------------------------------------
# 12. Page-Hinkley drift monitor on daily mean values
# ---------------------------------------------------------------------

def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift test on the daily mean event value: the
    cumulative sum of each day's deviation from the running mean,
    with PH_t = M_t - min_{s<=t} M_s and an alarm when PH crosses
    50 value-units — the sequential changepoint monitor a streaming
    ingest pipeline runs on its own quality metrics (CUSUM's
    one-sided sibling, Page '54 / Hinkley '71).

    Cross-engine exactness: daily means are exact half-up integer
    micros; each deviation (day mean minus running mean, a rational
    with denominator t) is quantized with the MIRRORED signed
    half-up (half-away-from-zero — Spark `div` truncates toward
    zero and DuckDB `//` floors, so the negative branch is computed
    on the negated non-negative numerator in BOTH engines); the
    cumulative walk and the PH statistic are then plain integer
    window sums.

    Scale shape: events collapse to the per-day value frame in one
    aggregate; all windows run on that tens-of-rows frame — the
    established unpartitioned-window-on-compacted-frame pattern.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    vm = _vm_col()
    days = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(vm).alias("sum_vm"),
    ).selectExpr(
        "day",
        "n_events",
        "(2 * sum_vm + n_events) div (2 * n_events) AS mean_micros",
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = (
        days.withColumn("t", F.row_number().over(Window.orderBy("day")))
        .withColumn("r_cum", F.sum("mean_micros").over(w))
        .selectExpr(
            "day",
            "n_events",
            "mean_micros",
            # signed half-up of (t*mean_t - R_t) / t, mirrored
            "CASE WHEN t * mean_micros - r_cum >= 0 THEN"
            " (2 * (t * mean_micros - r_cum) + t) div (2 * t)"
            " ELSE -((2 * (r_cum - t * mean_micros) + t) div (2 * t))"
            " END AS dev_micros",
        )
    )
    m = walked.withColumn("m_cum", F.sum("dev_micros").over(w))
    ph = m.withColumn(
        "ph_micros", F.col("m_cum") - F.min("m_cum").over(w)
    )
    return ph.selectExpr(
        "day",
        "n_events",
        "CAST(mean_micros AS BIGINT) AS mean_micros",
        "CAST(m_cum AS BIGINT) AS m_cum_micros",
        "CAST(ph_micros AS BIGINT) AS ph_micros",
        f"CAST(CASE WHEN ph_micros > {_PH_LAMBDA_MICROS} THEN 1 ELSE 0 END"
        " AS BIGINT) AS alarm",
    ).orderBy("day")


PAGE_HINKLEY_ORACLE = f"""
WITH days AS (
  SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS n_events,
         SUM({_VM_DUCK}) AS sum_vm
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), means AS (
  SELECT day, n_events,
         (2 * sum_vm + n_events) // (2 * n_events) AS mean_micros
  FROM days
), walked AS (
  SELECT day, n_events, mean_micros,
         ROW_NUMBER() OVER (ORDER BY day) AS t,
         SUM(mean_micros) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS r_cum
  FROM means
), devs AS (
  SELECT day, n_events, mean_micros,
         CASE WHEN t * mean_micros - r_cum >= 0 THEN
           (2 * (t * mean_micros - r_cum) + t) // (2 * t)
         ELSE -((2 * (r_cum - t * mean_micros) + t) // (2 * t))
         END AS dev_micros
  FROM walked
), walk2 AS (
  SELECT day, n_events, mean_micros,
         SUM(dev_micros) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS m_cum
  FROM devs
), ph AS (
  SELECT day, n_events, mean_micros, m_cum,
         m_cum - MIN(m_cum) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW) AS ph_micros
  FROM walk2
)
SELECT day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(mean_micros AS BIGINT) AS mean_micros,
       CAST(m_cum AS BIGINT) AS m_cum_micros,
       CAST(ph_micros AS BIGINT) AS ph_micros,
       CAST(CASE WHEN ph_micros > {_PH_LAMBDA_MICROS} THEN 1 ELSE 0 END
            AS BIGINT) AS alarm
FROM ph
ORDER BY day
"""

# ---------------------------------------------------------------------
# 13. Theil T inequality index of user activity value
# ---------------------------------------------------------------------

def theil_index_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index over per-user total event value:
    T = (1/n) * sum((x_i/mu) * ln(x_i/mu)) — the decomposable
    inequality measure (0 = perfect equality, ln(n) = one user owns
    everything) that complements the Gini already in the catalog
    with the entropy-based member of the family.

    Cross-engine exactness via the quantize-then-sum rule
    (NUMERICS.md): T = (sum_i x_i*ln(x_i))/S - ln(mu); each user's
    ln(x_i) is quantized to INTEGER ppm immediately, the weighted
    sum x_i*lnppm_i accumulates DECIMAL(38,0)/HUGEINT exactly, and
    ln(mu) is ONE libm call quantized once — the emitted statistic
    is an all-integer expression of quantized logs, bit-stable in
    both engines.

    Scale shape: one scan -> per-user groupBy -> one 1-row
    aggregate; the x_i*lnppm_i products stay under 1e17 per user
    (value micros ~5e9 x ln-ppm ~2.4e7), exact headroom past 1e20
    users in 38 digits.
    """
    ev = load_table(spark, sf_dir, "events")
    vm = _vm_col()
    users = ev.groupBy("user_id").agg(
        F.sum(vm).cast("decimal(38,0)").alias("x")
    ).filter(F.col("x") > 0)
    terms = users.select(
        "x",
        F.round(F.log(F.col("x").cast("double")) * 1_000_000.0, 0)
        .cast("long")
        .alias("lnppm"),
    )
    agg = terms.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("lnppm")).alias("xl"),
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_users",
        "(2 * s + n) div (2 * n) AS mean_value_micros",
        "CASE WHEN n > 0 AND s > 0 THEN "
        "CAST((2 * xl + s) div (2 * s)"
        " - CAST(ROUND(LN(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
        "         * 1000000.0, 0) AS BIGINT) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS theil_t_ppm",
    )


THEIL_ORACLE = f"""
WITH users AS (
  SELECT user_id, CAST(SUM({_VM_DUCK}) AS HUGEINT) AS x
  FROM events GROUP BY user_id
  HAVING SUM({_VM_DUCK}) > 0
), terms AS (
  SELECT x,
         CAST(ROUND(LN(CAST(x AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
           AS lnppm
  FROM users
), agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS s,
         SUM(x * lnppm) AS xl
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST((2 * s + n) // (2 * n) AS BIGINT) AS mean_value_micros,
       CASE WHEN n > 0 AND s > 0 THEN
         CAST((2 * xl + s) // (2 * s)
              - CAST(ROUND(LN(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1000000.0, 0) AS BIGINT) AS BIGINT)
       ELSE 0 END AS theil_t_ppm
FROM agg
"""


# ---------------------------------------------------------------------
# 14. Horvitz-Thompson sampled token-total estimator
# ---------------------------------------------------------------------

def horvitz_thompson_token_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimate of the corpus TOKEN TOTAL from a
    deterministic unequal-probability Bernoulli sample — the
    estimator that makes stratified pipeline sampling (profile the
    'en' majority at 1/4 the rate of the long tail) still produce
    unbiased corpus-level statistics. Inclusion: doc d enters the
    sample when its md5 byte ('ht#'||doc_id) < 256*pi_d, with
    pi = 64/256 for lang='en' and 128/256 otherwise; each sampled
    doc contributes tokens_d / pi_d = tokens_d * 4 (or * 2) — exact
    INTEGERS, so estimate, truth, and the error decomposition are
    all integer-exact in both engines.

    Scale shape: one scan, one tokenize-count per doc (reuses the
    whitespace-token length expression, no explode), one 1-row
    aggregate; the sample decision is a per-row hash compare.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    h = F.md5(F.concat(F.lit("ht#"), F.col("doc_id").cast("string")))
    byte = md5_nibble(h, 1) * 16 + md5_nibble(h, 2)
    base = docs.select(
        F.size(F.split(F.lower("text"), " ")).alias("tok"),
        (F.col("lang") == "en").alias("is_en"),
        byte.alias("b"),
    )
    agg = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").cast("decimal(38,0)").alias("exact_total"),
        F.sum(
            F.when(F.col("is_en") & (F.col("b") < 64), 1)
            .when(~F.col("is_en") & (F.col("b") < 128), 1)
            .otherwise(0)
        ).alias("n_sampled"),
        F.sum(
            F.when(F.col("is_en") & (F.col("b") < 64), F.col("tok") * 4)
            .when(~F.col("is_en") & (F.col("b") < 128), F.col("tok") * 2)
            .otherwise(0)
        ).cast("decimal(38,0)").alias("ht_estimate"),
    )
    return agg.selectExpr(
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_sampled AS BIGINT) AS n_sampled",
        "CAST(exact_total AS BIGINT) AS exact_token_total",
        "CAST(ht_estimate AS BIGINT) AS ht_token_total",
        "CASE WHEN exact_total > 0 THEN "
        + nm.half_up_scaled_spark_sql(
            "ABS(ht_estimate - exact_total)", "exact_total", 6
        )
        + " ELSE CAST(0 AS BIGINT) END AS abs_rel_err_ppm",
    )


HORVITZ_THOMPSON_ORACLE = f"""
WITH base AS (
  SELECT LEN(STRING_SPLIT(LOWER(text), ' ')) AS tok,
         (lang = 'en') AS is_en,
         ({md5_nibble_sql("MD5('ht#' || CAST(doc_id AS VARCHAR))", 1)} * 16
          + {md5_nibble_sql("MD5('ht#' || CAST(doc_id AS VARCHAR))", 2)})
           AS b
  FROM documents WHERE text IS NOT NULL
), agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n_docs,
         CAST(SUM(tok) AS HUGEINT) AS exact_total,
         CAST(SUM(CASE WHEN is_en AND b < 64 THEN 1
                       WHEN NOT is_en AND b < 128 THEN 1
                       ELSE 0 END) AS HUGEINT) AS n_sampled,
         CAST(SUM(CASE WHEN is_en AND b < 64 THEN tok * 4
                       WHEN NOT is_en AND b < 128 THEN tok * 2
                       ELSE 0 END) AS HUGEINT) AS ht_estimate
  FROM base
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_sampled AS BIGINT) AS n_sampled,
       CAST(exact_total AS BIGINT) AS exact_token_total,
       CAST(ht_estimate AS BIGINT) AS ht_token_total,
       CASE WHEN exact_total > 0 THEN
         {nm.half_up_scaled_duck_sql(
             "ABS(ht_estimate - exact_total)", "exact_total", 6
         )}
       ELSE 0 END AS abs_rel_err_ppm
FROM agg
"""

# ---------------------------------------------------------------------
# 15. Tukey-fence outlier days on the daily event-count series
# ---------------------------------------------------------------------

def tukey_fences_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey inner-fence (1.5x IQR) outlier detection on the daily
    event-count series — the standard box-plot whisker rule every
    ops dashboard applies before alerting, here in the
    exact-integer spelling: Q1/Q3 are discrete order statistics
    (percentile_disc semantics via the cumulative-count rule
    4*cum >= n / 4*cum >= 3n on the count-value frame), and the
    fences are compared at 2x scale (2c vs 2*Q3 + 3*IQR, i.e.
    c vs Q3 + 1.5*IQR) so no division or float ever appears.

    Scale shape: events collapse to the per-day count frame, the
    order statistics ride the distinct-count value frame (bounded by
    count cardinality, not days), the verdict is one aggregate.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("c"))
    vals = days.groupBy("c").agg(F.count("*").alias("k"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.withColumn("cum", F.sum("k").over(w))
    tot = cum.agg(F.max("cum").alias("n"))
    q = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("c")))
            .alias("q1"),
            F.min(F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("c")))
            .alias("q3"),
            F.max("n").alias("n_days"),
        )
    )
    flagged = days.crossJoin(F.broadcast(q)).agg(
        F.max("n_days").alias("n_days"),
        F.max("q1").alias("q1_daily_count"),
        F.max("q3").alias("q3_daily_count"),
        F.sum(
            F.when(
                2 * F.col("c")
                < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1")),
                1,
            ).otherwise(0)
        ).alias("n_low_outlier_days"),
        F.sum(
            F.when(
                2 * F.col("c")
                > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1")),
                1,
            ).otherwise(0)
        ).alias("n_high_outlier_days"),
    )
    return flagged.selectExpr(
        "CAST(n_days AS BIGINT) AS n_days",
        "CAST(q1_daily_count AS BIGINT) AS q1_daily_count",
        "CAST(q3_daily_count AS BIGINT) AS q3_daily_count",
        "CAST(q3_daily_count - q1_daily_count AS BIGINT) AS iqr",
        "CAST(n_low_outlier_days AS BIGINT) AS n_low_outlier_days",
        "CAST(n_high_outlier_days AS BIGINT) AS n_high_outlier_days",
    )


TUKEY_FENCES_ORACLE = """
WITH days AS (
  SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), vals AS (
  SELECT c, COUNT(*) AS k FROM days GROUP BY c
), cum AS (
  SELECT c, SUM(k) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum
  FROM vals
), tot AS (SELECT MAX(cum) AS n FROM cum),
q AS (
  SELECT MIN(CASE WHEN 4 * cum >= (SELECT n FROM tot) THEN c END) AS q1,
         MIN(CASE WHEN 4 * cum >= 3 * (SELECT n FROM tot) THEN c END) AS q3,
         (SELECT n FROM tot) AS n_days
  FROM cum
)
SELECT CAST(q.n_days AS BIGINT) AS n_days,
       CAST(q.q1 AS BIGINT) AS q1_daily_count,
       CAST(q.q3 AS BIGINT) AS q3_daily_count,
       CAST(q.q3 - q.q1 AS BIGINT) AS iqr,
       CAST(SUM(CASE WHEN 2 * d.c < 2 * q.q1 - 3 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outlier_days,
       CAST(SUM(CASE WHEN 2 * d.c > 2 * q.q3 + 3 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outlier_days
FROM days d CROSS JOIN q
GROUP BY q.n_days, q.q1, q.q3
"""


# ---------------------------------------------------------------------
# 16. Cochran-Armitage trend test: purchase rate across activity quintiles
# ---------------------------------------------------------------------

def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR TREND in purchase
    propensity across user-activity quintiles — the ordered-groups
    sibling of the chi-square independence test: chi-square asks
    "do the rates differ?", CA asks "do they rise with activity?",
    which is the actual product question. Users are bucketed into 5
    quintiles by total event count (the kendall-style exact
    cumulative-count rule on the count-value frame), scores
    w_k = 0..4, the binary is "user's purchase SHARE exceeds the
    corpus purchase share" (an exact integer cross-multiply —
    "ever purchased" saturates at this event density, every user
    qualifies), and Z = (N*sum(w*r) - R*sum(w*n)) * sqrt(N) /
    sqrt(R*(N-R)*(N*sum(w^2*n) - sum(w*n)^2)).

    Cross-engine exactness: every sum is an exact integer
    (DECIMAL(38,0)/HUGEINT); the emission is the spearman posture —
    one CAST-to-double of exact integers, two IEEE sqrts, one
    ROUND(...,6); the signed numerator rides the double (no div).

    Scale shape: events collapse to the per-user frame, the
    quintile boundaries ride the count-value frame (bounded by
    distinct activity counts), and the statistic is a 5-row
    aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    raw = ev.groupBy("user_id").agg(
        F.count("*").alias("cnt"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np"),
    )
    glob = raw.agg(
        F.sum("cnt").cast("decimal(38,0)").alias("e_tot"),
        F.sum("np").cast("decimal(38,0)").alias("p_tot"),
    )
    users = raw.crossJoin(F.broadcast(glob)).selectExpr(
        "user_id",
        "cnt",
        "CASE WHEN CAST(np AS DECIMAL(38,0)) * e_tot"
        " > CAST(cnt AS DECIMAL(38,0)) * p_tot THEN 1 ELSE 0 END"
        " AS purchased",
    )
    vals = users.groupBy("cnt").agg(F.count("*").alias("k"))
    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, -1)
    buck = vals.withColumn(
        "cum_before", F.coalesce(F.sum("k").over(w), F.lit(0))
    )
    tot = users.agg(F.count("*").alias("n_total"))
    bucketed = (
        buck.crossJoin(F.broadcast(tot))
        .selectExpr("cnt", "(cum_before * 5) div n_total AS wk")
    )
    joined = users.join(bucketed, "cnt")
    per_k = joined.groupBy("wk").agg(
        F.count("*").cast("decimal(38,0)").alias("nk"),
        F.sum("purchased").cast("decimal(38,0)").alias("rk"),
    )
    agg = per_k.agg(
        F.sum("nk").alias("n"),
        F.sum("rk").alias("r"),
        F.sum(F.col("wk") * F.col("rk")).alias("swr"),
        F.sum(F.col("wk") * F.col("nk")).alias("swn"),
        F.sum(F.col("wk") * F.col("wk") * F.col("nk")).alias("swwn"),
        F.count("*").alias("n_groups"),
    )
    guard = (
        "r > 0 AND r < n AND n * swwn - swn * swn > 0"
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_users",
        "CAST(r AS BIGINT) AS n_purchasers",
        "CAST(n_groups AS BIGINT) AS n_groups",
        f"CASE WHEN {guard} THEN"
        " ROUND(CAST(n * swr - r * swn AS DOUBLE) * SQRT(CAST(n AS DOUBLE))"
        "  / SQRT(CAST(r * (n - r) * (n * swwn - swn * swn) AS DOUBLE)), 6)"
        " ELSE 0.0 END AS ca_trend_z",
    )


COCHRAN_ARMITAGE_ORACLE = """
WITH raw AS (
  SELECT user_id, COUNT(*) AS cnt,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM events GROUP BY user_id
), gtot AS (
  SELECT CAST(SUM(cnt) AS HUGEINT) AS e_tot,
         CAST(SUM(np) AS HUGEINT) AS p_tot
  FROM raw
), users AS (
  SELECT user_id, cnt,
         CASE WHEN CAST(np AS HUGEINT) * (SELECT e_tot FROM gtot)
              > CAST(cnt AS HUGEINT) * (SELECT p_tot FROM gtot)
         THEN 1 ELSE 0 END AS purchased
  FROM raw
), vals AS (
  SELECT cnt, COUNT(*) AS k FROM users GROUP BY cnt
), buck AS (
  SELECT cnt,
         COALESCE(SUM(k) OVER (ORDER BY cnt ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM vals
), tot AS (SELECT COUNT(*) AS n_total FROM users),
bucketed AS (
  SELECT cnt, (cum_before * 5) // (SELECT n_total FROM tot) AS wk
  FROM buck
), per_k AS (
  SELECT wk,
         CAST(COUNT(*) AS HUGEINT) AS nk,
         CAST(SUM(purchased) AS HUGEINT) AS rk
  FROM users u JOIN bucketed b ON u.cnt = b.cnt
  GROUP BY wk
), agg AS (
  SELECT SUM(nk) AS n, SUM(rk) AS r,
         SUM(wk * rk) AS swr, SUM(wk * nk) AS swn,
         SUM(wk * wk * nk) AS swwn,
         CAST(COUNT(*) AS HUGEINT) AS n_groups
  FROM per_k
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(r AS BIGINT) AS n_purchasers,
       CAST(n_groups AS BIGINT) AS n_groups,
       CASE WHEN r > 0 AND r < n AND n * swwn - swn * swn > 0 THEN
         ROUND(CAST(n * swr - r * swn AS DOUBLE) * SQRT(CAST(n AS DOUBLE))
           / SQRT(CAST(r * (n - r) * (n * swwn - swn * swn) AS DOUBLE)), 6)
       ELSE 0.0 END AS ca_trend_z
FROM agg
"""
