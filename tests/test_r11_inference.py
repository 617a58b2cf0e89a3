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
        assert abs(row.mcnemar_chi2 - (b - c) ** 2 / (b + c)) < 1e-5
        assert row.mcnemar_cc <= row.mcnemar_chi2


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
