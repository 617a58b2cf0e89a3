"""Round-11 semantic pins for the statistical-inference batch
(plans/inference.py) — invariants the DuckDB-parity hash can't
express: Kendall tau-b against a brute-force pairwise recount,
Kruskal-Wallis / Levene non-negativity and rank-sum identities,
Chao1 >= observed vocabulary, the McNemar 2x2 partition, LSH S-curve
monotonicity (more bands => higher recall AND more candidates at
fixed k), bootstrap CI ordering around the point mean, assortativity
in [-1, 1], and JSD in [0, 1] bits.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_flink_streaming_example_with_test_spark.plans import inference as inf
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_xy():
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT n_chars AS x, LEN(STRING_SPLIT(LOWER(text), ' ')) AS y
        FROM '{SF_DIR}/documents.parquet' WHERE text IS NOT NULL
        """
    ).fetchall()
    con.close()
    return rows


def test_kendall_matches_bruteforce_on_buckets(spark, docs_xy):
    """Concordant/discordant/tau from the engine equal an O(n^2)
    Python recount over the SAME decile bucketing (reconstructed
    from cumulative counts, as the query defines it)."""
    import math
    from collections import Counter

    row = inf.kendall_tau_decile_assoc(spark, SF_DIR).collect()[0]
    n = len(docs_xy)

    def buckets(vals):
        cnt = Counter(vals)
        cum = 0
        b = {}
        for v in sorted(cnt):
            b[v] = (cum * 10) // n
            cum += cnt[v]
        return b

    bx = buckets([x for x, _ in docs_xy])
    by = buckets([y for _, y in docs_xy])
    pts = [(bx[x], by[y]) for x, y in docs_xy]
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    assert row.concordant == conc
    assert row.discordant == disc
    n0 = n * (n - 1) // 2
    denom = math.sqrt(n0 - row.x_tie_pairs) * math.sqrt(
        n0 - row.y_tie_pairs
    )
    assert abs(row.kendall_tau_b - (conc - disc) / denom) < 1e-5
    assert -1.0 <= row.kendall_tau_b <= 1.0


def test_kruskal_wallis_rank_identity(spark):
    """Sum of per-source doubled rank sums = 2 * (1 + 2 + ... + N)
    (the mid-rank construction partitions the pooled ranks), H >= 0,
    and the tie correction sits in (0, 1]."""
    rows = inf.kruskal_wallis_by_source(spark, SF_DIR).collect()
    n = rows[0].n_total
    # mean_rank * 2 * n_i recovers the doubled rank sum up to the
    # 6-dp quantization; check the identity through the exact parts
    total_rank_x2 = sum(
        round(r.mean_rank * 2 * r.n_docs_src) for r in rows
    )
    assert total_rank_x2 == 2 * n * (n + 1) // 2
    assert rows[0].h_stat >= 0.0
    assert 0.0 < rows[0].tie_correction <= 1.0
    assert rows[0].h_corrected >= rows[0].h_stat - 1e-9


def test_chao1_bounds(spark):
    """Chao1 >= observed vocabulary (it adds a non-negative unseen
    estimate); Good-Turing unseen mass = f1/n in [0, 1]."""
    rows = inf.chao1_vocab_richness(spark, SF_DIR).collect()
    assert rows, "no sources"
    for r in rows:
        assert r.chao1_est >= r.vocab
        assert 0.0 <= r.gt_unseen_mass <= 1.0
        assert r.f1_singletons + 2 * r.f2_doubletons <= r.n_bigrams


def test_levene_nonnegative_and_median_is_real(spark):
    """W >= 0; each per-source median is an attained n_chars value
    with at least half the group on each side."""
    import duckdb as dk

    rows = inf.levene_brown_forsythe(spark, SF_DIR).collect()
    assert rows[0].levene_w >= 0.0
    con = dk.connect()
    for r in rows[:3]:
        lo, hi, present = con.sql(
            f"""
            SELECT SUM(CASE WHEN n_chars <= {r.median_chars} THEN 1
                       ELSE 0 END),
                   SUM(CASE WHEN n_chars >= {r.median_chars} THEN 1
                       ELSE 0 END),
                   MAX(CASE WHEN n_chars = {r.median_chars} THEN 1
                       ELSE 0 END)
            FROM '{SF_DIR}/documents.parquet'
            WHERE source = '{r.source}'
            """
        ).fetchone()
        assert present == 1
        assert 2 * lo >= r.n_docs_src and 2 * hi >= r.n_docs_src
    con.close()


def test_mcnemar_partition_and_stat(spark):
    """The 2x2 cells partition the corpus; the statistic matches the
    closed form on the discordant cells."""
    row = inf.mcnemar_filter_agreement(spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    n = con.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
        " WHERE text IS NOT NULL"
    ).fetchone()[0]
    con.close()
    assert (
        row.n_both + row.n_a_only + row.n_b_only + row.n_neither == n
    )
    b, c = row.n_a_only, row.n_b_only
    if b + c > 0:
        import decimal

        exact = (
            decimal.Decimal((b - c) ** 2 * 10**6) / (b + c)
        ).to_integral_value(rounding=decimal.ROUND_HALF_UP)
        assert row.mcnemar_chi2_ppm == int(exact)
        assert isinstance(row.mcnemar_chi2_ppm, int)
        assert row.mcnemar_cc_ppm <= row.mcnemar_chi2_ppm


def test_lsh_scurve_monotonicity(spark):
    """At fixed k = b*r, more bands (fewer rows per band) always
    collide more: expected candidates AND recall are non-increasing
    as bands decrease; s* increases."""
    rows = inf.lsh_band_planning(spark, SF_DIR).collect()
    rows = sorted(rows, key=lambda r: -r.bands)
    assert [r.bands * r.rows_per_band for r in rows] == [16] * len(rows)
    for a, b in zip(rows, rows[1:]):
        assert a.exp_candidates >= b.exp_candidates
        assert a.recall_at_07 >= b.recall_at_07
        assert a.s_star <= b.s_star
    for r in rows:
        assert 0.0 <= r.recall_at_07 <= 1.0
        assert r.exp_candidates <= r.n_pairs_scored


def test_bootstrap_ci_orders_around_mean(spark):
    """lo <= hi, both within the observed value range, and the
    replicate count is exactly 64."""
    row = inf.bootstrap_mean_ci_events(spark, SF_DIR).collect()[0]
    assert row.n_replicates == 64
    assert row.boot_ci_lo <= row.boot_ci_hi
    # multiplier bootstrap means stay inside the sample's min/max
    con = duckdb.connect()
    lo, hi = con.sql(
        f"SELECT MIN(value), MAX(value) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    con.close()
    assert lo <= row.boot_ci_lo and row.boot_ci_hi <= hi


def test_assortativity_in_range(spark):
    row = inf.graph_degree_assortativity(spark, SF_DIR).collect()[0]
    assert -1.0 <= row.assortativity <= 1.0
    assert row.n_directed_edges > 0
    assert row.n_directed_edges % 2 == 0  # both orientations present


def test_jsd_bounded_and_zero_for_identical(spark):
    """JSD in [0, 1] bits for every source; a source whose
    distribution equals the corpus would give ~0 (can't hold exactly
    here, but values must be well inside the bound)."""
    rows = inf.jsd_source_token_divergence(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.jsd_bits <= 1.0


# ----------------------- batch 2 pins --------------------------------

def test_cramers_v_bounds_and_chi2_consistency(spark):
    """V in [0, 1]; chi2_total equals the sum of the cell query's
    contributions (same quantization, independently composed)."""
    from spark_flink_streaming_example_with_test_spark.plans import evalstats as ev

    row = inf.cramers_v_source_lang(spark, SF_DIR).collect()[0]
    assert 0.0 <= row.cramers_v <= 1.0
    cells = ev.chi_square_source_lang(spark, SF_DIR).collect()
    total = sum(c.chi2_contrib for c in cells)
    assert abs(row.chi2_total - total) < 1e-3 * max(1.0, total)


def test_cochran_q_reduces_to_mcnemar_shape(spark):
    """Q >= 0, and the filter totals are each <= n_docs."""
    row = inf.cochran_q_filters(spark, SF_DIR).collect()[0]
    assert row.cochran_q >= 0.0
    for c in (row.c_a, row.c_b, row.c_c):
        assert 0 <= c <= row.n_docs


def test_runs_test_run_count_bounds(spark):
    """1 <= runs <= n_days_used; runs >= 2 whenever both signs are
    present; and z equals the textbook closed form z = (R - mu) /
    sigma with mu = 2ab/N + 1 and sigma^2 = 2ab(2ab - N) /
    (N^2 (N - 1)) — the pin that caught the r11 advisor finding
    (an extra /N deflated |z| ~n-fold, so the test never rejected
    randomness)."""
    import math

    row = inf.runs_test_daily_counts(spark, SF_DIR).collect()[0]
    assert 1 <= row.n_runs <= row.n_days_used
    if row.n_above > 0 and row.n_below > 0:
        assert row.n_runs >= 2
    assert row.n_above + row.n_below == row.n_days_used
    a, b, r = row.n_above, row.n_below, row.n_runs
    n = a + b
    if a > 0 and b > 0 and 2 * a * b * (2 * a * b - n) > 0:
        mu = 2.0 * a * b / n + 1.0
        sigma = math.sqrt(
            2.0 * a * b * (2.0 * a * b - n) / (n * n * (n - 1.0))
        )
        assert abs(row.runs_z - (r - mu) / sigma) < 1e-5


def test_friedman_rank_sums_partition(spark):
    """Sum of doubled rank sums over types = n_blocks * k * (k+1)
    (each block hands out doubled ranks summing to k(k+1));
    chi2 >= 0."""
    rows = inf.friedman_event_types_by_day(spark, SF_DIR).collect()
    n, k = rows[0].n_blocks, rows[0].k_treatments
    assert sum(r.rank_sum_x2 for r in rows) == n * k * (k + 1)
    assert rows[0].friedman_chi2 >= 0.0


def test_capture_recapture_sane(spark):
    """Captures are subsets of the true pair set; the Chapman
    estimate is non-negative and m <= min(n1, n2)."""
    row = inf.capture_recapture_dup_estimate(spark, SF_DIR).collect()[0]
    assert 0 <= row.n_both <= min(row.n_capture1, row.n_capture2)
    assert max(row.n_capture1, row.n_capture2) <= row.true_pairs
    assert row.chapman_est >= 0.0


def test_herfindahl_bounds(spark):
    """1/k <= HHI <= 1 and the normalized form sits in [0, 1]."""
    row = inf.herfindahl_token_concentration(spark, SF_DIR).collect()[0]
    k = row.n_sources
    assert 1.0 / k - 1e-6 <= row.hhi <= 1.0
    assert 0.0 <= row.hhi_normalized <= 1.0


def test_quality_lift_monotone_gains(spark):
    """Cumulative positive share is non-decreasing walking down the
    deciles and reaches 1 at the last row; lift at the full corpus
    is exactly 1."""
    rows = inf.quality_decile_lift(spark, SF_DIR).collect()
    shares = [r.cum_pos_share for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9
    assert abs(rows[-1].lift - 1.0) < 1e-9
    assert rows[-1].cum_docs == sum(r.n_docs for r in rows)


# ----------------------- batch 3 pins --------------------------------

def test_mood_above_counts_and_chi2(spark):
    """Above-median counts are bounded by group sizes; the global
    median is attained; chi2 >= 0."""
    rows = inf.mood_median_test(spark, SF_DIR).collect()
    assert rows[0].mood_chi2 >= 0.0
    total_above = sum(r.n_above_median for r in rows)
    n = rows[0].n_total
    # strictly-above count is at most half the corpus (lower median)
    assert 0 <= total_above <= n // 2 + 1
    for r in rows:
        assert 0 <= r.n_above_median <= r.n_docs_src


def test_entropy_rate_bounds(spark):
    """0 <= H(unigram) <= H(bigram) <= 2*H(unigram)-ish bounds:
    specifically rate in [0 - eps, H(unigram)] for a stationary-ish
    source (conditioning cannot increase entropy; a bigram carries at
    most twice the unigram bits)."""
    rows = inf.entropy_rate_bigram(spark, SF_DIR).collect()
    for r in rows:
        assert r.h_unigram_bits >= 0.0
        assert r.h_bigram_bits >= r.h_unigram_bits - 1e-4
        assert r.h_bigram_bits <= 2 * r.h_unigram_bits + 1e-4
        assert -1e-4 <= r.entropy_rate_bits <= r.h_unigram_bits + 1e-4


def test_dsir_quintiles_partition_and_purity(spark):
    """Quintiles partition the corpus; purity is a valid share; the
    top quintile is at least as target-pure as the bottom one
    (importance weighting must concentrate the target)."""
    import duckdb as dk

    rows = inf.dsir_importance_buckets(spark, SF_DIR).collect()
    con = dk.connect()
    n = con.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    con.close()
    assert sum(r.n_docs for r in rows) == n
    for r in rows:
        assert 0.0 <= r.target_purity <= 1.0
        assert r.mean_importance_ratio > 0.0
    bottom = rows[0]
    top = rows[-1]
    # snorm quantizes the per-token mean at 1e-4; allow that slack
    assert (top.mean_importance_ratio
            >= bottom.mean_importance_ratio - 2e-4)
    assert top.target_purity >= bottom.target_purity


def test_fellegi_sunter_probabilities(spark):
    """m and u are valid probabilities over their populations; every
    field row shares the same pair counts."""
    rows = inf.fellegi_sunter_mu_weights(spark, SF_DIR).collect()
    assert len(rows) == 3
    n_match = {r.n_match for r in rows}
    n_non = {r.n_nonmatch for r in rows}
    assert len(n_match) == 1 and len(n_non) == 1
    for r in rows:
        assert 0 <= r.agree_m <= r.n_match
        assert 0 <= r.agree_u <= r.n_nonmatch
        assert 0.0 <= r.m_prob <= 1.0
        assert 0.0 <= r.u_prob <= 1.0


def test_bootstrap_weight_bit_decomposition_is_binomial():
    """The multiplier-bootstrap weight w(v8) = #{bit-pairs of v8 that
    equal 00} realizes EXACTLY Binomial(4, 1/4) over the uniform
    byte: counts {0: 81, 1: 108, 2: 54, 3: 12, 4: 1} out of 256 —
    C(4,k) * 3^(4-k). Pure arithmetic mirror of the SQL expression;
    a wrong bit split (e.g. overlapping shifts) breaks this
    immediately."""
    from collections import Counter

    def w(v8: int) -> int:
        return (
            int(v8 // 64 == 0)
            + int((v8 // 16) % 4 == 0)
            + int((v8 // 4) % 4 == 0)
            + int(v8 % 4 == 0)
        )

    hist = Counter(w(v) for v in range(256))
    assert hist == {0: 81, 1: 108, 2: 54, 3: 12, 4: 1}
    # mean exactly 1: sum k * count = 256
    assert sum(k * c for k, c in hist.items()) == 256
