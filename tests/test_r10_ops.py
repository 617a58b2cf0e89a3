"""Round-10 semantic pins for the curation-decision queries
(plans/curation.py) — invariants the DuckDB-parity hash can't
express: monotonicity of the threshold sweep, curriculum phase
balance, silhouette bounds, and a PLANTED-ORPHAN run of the
referential-integrity audit against a mutated copy of the warehouse
(the parity fixture has zero orphans, so without the plant the
orphan columns would only ever be checked at zero).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import duckdb
import pytest

from spark_flink_streaming_example_with_test_spark.plans import curation as cu
from tests.conftest import SF_DIR


def test_threshold_sweep_monotone_and_complete(spark):
    rows = {
        r["t_pct"]: r
        for r in cu.dedup_threshold_sensitivity(spark, SF_DIR)
        .collect()
    }
    assert sorted(rows) == [40, 50, 60, 70, 80, 90], (
        "every threshold must emit a row, even at zero pairs"
    )
    for lo, hi in zip([40, 50, 60, 70, 80], [50, 60, 70, 80, 90]):
        assert rows[hi]["n_pairs"] <= rows[lo]["n_pairs"]
        assert rows[hi]["n_flagged"] <= rows[lo]["n_flagged"]
        assert rows[hi]["n_survivors"] >= rows[lo]["n_survivors"]
    for r in rows.values():
        assert r["n_flagged"] + r["n_survivors"] >= r["n_flagged"] >= 0


def test_curriculum_phases_partition_each_source(spark):
    from pyspark.sql import functions as F

    from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

    out = cu.curriculum_phase_assignment(spark, SF_DIR).collect()
    per_src: dict[str, dict[int, int]] = {}
    for r in out:
        assert 1 <= r["phase"] <= 4
        per_src.setdefault(r["source"], {})[r["phase"]] = r["n_docs"]
    truth = {
        r["source"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_src) == set(truth)
    for src, phases in per_src.items():
        assert sum(phases.values()) == truth[src]
        if truth[src] >= 4:
            # ceil(4r/n) splits a source into quartile bands whose
            # sizes differ by at most one
            sizes = [phases.get(p, 0) for p in (1, 2, 3, 4)]
            assert max(sizes) - min(sizes) <= 1, (src, sizes)


def test_silhouette_bounds_and_coverage(spark):
    from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

    out = cu.centroid_silhouette_score(spark, SF_DIR).collect()
    assert out, "12 seeded centroids must yield at least one cluster"
    n_total = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_vectors"] for r in out) == n_total
    for r in out:
        assert 0 <= r["cent_id"] < 12
        assert 0.0 <= r["avg_silhouette"] <= 1.0


def test_hard_negatives_never_share_label(spark):
    out = cu.hard_negative_mining(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["q_label"] != r["neg_label"]
        assert 1 <= r["rk"] <= 5
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_maxsim_bounded_by_query_count(spark):
    for r in cu.multi_vector_maxsim(spark, SF_DIR).collect():
        assert r["n_query_vecs"] >= 1
        # each per-query term is a cosine <= 1 (+ ppm rounding slack)
        assert r["maxsim"] <= r["n_query_vecs"] + 1e-6
        assert r["maxsim"] >= -r["n_query_vecs"] - 1e-6


def test_normalization_ladder_monotone(spark):
    out = {
        r["normalization"]: r
        for r in cu.text_normalization_collision_audit(spark, SF_DIR)
        .collect()
    }
    assert set(out) == {"raw", "casefold", "alnum"}
    assert out["raw"]["n_distinct"] >= out["casefold"]["n_distinct"]
    assert out["casefold"]["n_distinct"] >= out["alnum"]["n_distinct"]
    assert out["raw"]["collisions_gained"] == 0
    assert (
        out["casefold"]["collisions_gained"]
        == out["raw"]["n_distinct"] - out["casefold"]["n_distinct"]
    )


@pytest.fixture(scope="module")
def planted_orphan_dir(tmp_path_factory) -> str:
    """A copy of the sf0.001 warehouse with one orphan lineitem row
    (l_orderkey = -999 matching no order) and one orphan customer
    (c_nationkey = -7 matching no nation)."""
    dst = tmp_path_factory.mktemp("orphan_wh")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ]:
        src = Path(SF_DIR) / f"{t}.parquet"
        if t == "lineitem":
            duckdb.sql(
                f"""
                COPY (
                  (SELECT * FROM read_parquet('{src}'))
                  UNION ALL BY NAME
                  (SELECT * REPLACE (-999 AS l_orderkey)
                   FROM read_parquet('{src}') LIMIT 1)
                ) TO '{dst / t}.parquet' (FORMAT PARQUET)
                """
            )
        elif t == "customer":
            duckdb.sql(
                f"""
                COPY (
                  (SELECT * FROM read_parquet('{src}'))
                  UNION ALL BY NAME
                  (SELECT * REPLACE (-7 AS c_nationkey, -1 AS c_custkey)
                   FROM read_parquet('{src}') LIMIT 1)
                ) TO '{dst / t}.parquet' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copy(src, dst / f"{t}.parquet")
    return str(dst)


def test_referential_audit_finds_planted_orphans(spark, planted_orphan_dir):
    out = {
        r["relationship"]: r
        for r in cu.referential_integrity_audit(spark, planted_orphan_dir)
        .collect()
    }
    assert len(out) == 7
    assert out["lineitem.l_orderkey->orders"]["n_orphans"] == 1
    assert out["customer.c_nationkey->nation"]["n_orphans"] == 1
    # the planted customer keeps a valid custkey-side count
    assert out["orders.o_custkey->customer"]["n_orphans"] == 0
    assert out["lineitem.l_partkey->part"]["n_orphans"] == 0
    assert out["supplier.s_nationkey->nation"]["n_orphans"] == 0
    for r in out.values():
        assert 0 <= r["n_orphans"] <= r["n_child_rows"]


def test_sampled_dup_rate_planted_duplicates(spark, tmp_path):
    """Plant a known duplicate mass: copy sf0.001 documents and
    append exact copies of 50 docs — the exact dup-rate must equal
    the planted rational exactly (half-up at 6 dp), and the sampled
    estimate must stay a valid rate from the hash-range subsample."""
    src = Path(SF_DIR) / "documents.parquet"
    n0 = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{src}')").fetchone()[0]
    dup = min(50, n0)
    dst = tmp_path / "docs_wh"
    dst.mkdir()
    duckdb.sql(
        f"""
        COPY (
          (SELECT * FROM read_parquet('{src}'))
          UNION ALL BY NAME
          (SELECT * REPLACE (doc_id + 1000000 AS doc_id)
           FROM read_parquet('{src}') ORDER BY doc_id LIMIT {dup})
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    row = cu.sampled_dup_rate_estimator(spark, str(dst)).collect()[0]
    n = n0 + dup
    assert row["n_total"] == n
    expect = ((n - n0) * 2 * 10**6 + n) // (2 * n) / 1e6
    assert row["dup_rate_exact"] == expect
    assert 0.0 <= row["dup_rate_sampled"] <= 1.0
    assert 0 < row["n_sample"] < n
