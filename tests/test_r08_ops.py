"""Targeted unit tests for the round-8 operators, on crafted inputs
that pin semantics the fixture-scale oracle parity can't isolate:
k-core peeling on a known graph, threshold-run encoding arithmetic,
int8 quantization clamping, KS statistic on hand-computable
distributions, and IVF assignment determinism."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _write_docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": langs or ["en"] * n,
            "source": sources or ["src0"] * n,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_kcore_peeling_monotone_on_fixture_graph(spark):
    """k-core peeling is monotone: each round's surviving node and
    edge counts can only shrink (exact values are pinned by the
    DuckDB oracle in the parity suite; this pins the structural
    invariant on the fixture ring+chord graph)."""
    from spark_flink_streaming_example_with_test_spark.plans.analytics import kcore_decomposition

    out = {r["round"]: r for r in kcore_decomposition(spark, str_sf()).collect()}
    assert set(out) == {1, 2, 3}
    # peeling is monotone non-increasing in both nodes and edges
    assert out[1].n_nodes >= out[2].n_nodes >= out[3].n_nodes
    assert out[1].n_edges >= out[2].n_edges >= out[3].n_edges
    assert out[3].n_nodes >= 0 and out[3].n_edges >= 0


def str_sf() -> str:
    from tests.conftest import SF_DIR

    return SF_DIR


def test_anomaly_run_lengths_hand_example(spark, tmp_path):
    """values H H L H (H > 80): two runs, longest 2, 3 high."""
    import datetime as dt

    from spark_flink_streaming_example_with_test_spark.plans.analytics import anomaly_run_lengths

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 7, "click", v, "{}")
        for i, v in enumerate([90.0, 95.0, 10.0, 85.0])
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.user_id: r for r in anomaly_run_lengths(spark, str(tmp_path)).collect()}
    assert out[7].n_runs == 2
    assert out[7].longest_run == 2
    assert out[7].n_high_events == 3


def test_int8_quant_zero_scale_and_out_of_sample_clamp(spark, tmp_path):
    """Calibration-sample scales (even vec_ids) applied to held-out
    vectors: a zero-in-calibration dimension quantizes to exactly 0
    (never NaN from 0/0), and a held-out component EXCEEDING the
    calibration max must clamp to the int8 ceiling — the genuine
    out-of-range saturation the audit exists to count (with
    full-data scales, clamping is impossible by construction)."""
    from spark_flink_streaming_example_with_test_spark.plans.llm import embedding_int8_quant_error

    vecs = [
        [0.0, 1.0, -2.0] + [0.5] * 61,   # vec 0: the calibration sample
        [0.0, 3.0, 2.0] + [0.25] * 61,   # vec 1: held out; dim1=3 > cal max 1
    ]
    pd.DataFrame(
        {"vec_id": [0, 1], "embedding": vecs, "label": [0, 0]}
    ).to_parquet(tmp_path / "embeddings.parquet")
    rows = embedding_int8_quant_error(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_components == 128
    assert r.mse == r.mse  # not NaN (dim0 scale is 0)
    assert r.n_clamped == 1  # exactly the planted out-of-range dim
    # the clamped component saturates at the calibration max: 3.0 -> 1.0
    assert abs(r.max_abs_err - 2.0) < 1e-9


def test_ks_drift_identical_distributions_zero(spark, tmp_path):
    """src0 and src1 with identical token-length multisets must give
    KS = 0 and no drift; disjoint length ranges must give KS = 1."""
    from spark_flink_streaming_example_with_test_spark.plans.llm import ks_drift_between_sources

    same = ["a b c", "d e f g", "h i"]
    sf = _write_docs(
        tmp_path,
        same + same,
        sources=["src0"] * 3 + ["src1"] * 3,
    )
    r = ks_drift_between_sources(spark, sf).collect()[0]
    assert r.ks_stat == 0.0 and not r.drift_detected

    long_docs = ["w " * 30, "x " * 31, "y " * 32]
    sf2 = tmp_path / "disjoint"
    sf2.mkdir()
    _write_docs(sf2, same + long_docs, sources=["src0"] * 3 + ["src1"] * 3)
    r2 = ks_drift_between_sources(spark, str(sf2)).collect()[0]
    assert r2.ks_stat == 1.0


def test_ivf_assignments_deterministic_and_total(spark, sf_dir):
    """Every non-zero-norm vector gets exactly one centroid, and the
    assignment is identical across runs (seeded centroids, rounded
    tiebreak)."""
    from spark_flink_streaming_example_with_test_spark.operators.similarity import ivf_assignments
    from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a1 = {r.vec_id: r.cent_id for r in ivf_assignments(emb, 16).collect()}
    a2 = {r.vec_id: r.cent_id for r in ivf_assignments(emb, 16).collect()}
    assert a1 == a2
    assert len(a1) == emb.count()  # fixture has no zero-norm vectors
    assert set(a1.values()) <= set(range(16))


def test_shard_balance_shares_sum_to_one(spark, sf_dir):
    from spark_flink_streaming_example_with_test_spark.plans.analytics import shard_assignment_balance

    rows = shard_assignment_balance(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert all(r.imbalance_factor >= 1.0 for r in rows)
    assert all(0 <= r.bucket < 32 for r in rows)


def test_flesch_monotone_in_sentence_length(spark, tmp_path):
    """Shorter sentences (same words) must score easier (higher)."""
    from spark_flink_streaming_example_with_test_spark.plans.llm import flesch_reading_ease

    choppy = "the cat sat. the dog ran. we go now. it is red."
    runon = "the cat sat the dog ran we go now it is red"
    sf = _write_docs(
        tmp_path, [choppy, runon], sources=["choppy", "runon"]
    )
    rows = {r.source: r.avg_flesch for r in flesch_reading_ease(spark, sf).collect()}
    assert rows["choppy"] > rows["runon"]


def test_kcore_matches_bruteforce_peeling(spark):
    """The 3-round unrolled k=4 peeling must match a driver-side
    brute-force peel of the same ring+chord graph (independent
    reimplementation, no SQL)."""
    from spark_flink_streaming_example_with_test_spark.plans.analytics import kcore_decomposition
    from tests.conftest import SF_DIR

    import duckdb

    n = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    edges = set()
    for i in range(n):
        for mult, add in ((1, 1), (1, 2), (3, 7)):
            a, b = i, (i * mult + add) % n
            if a != b:
                edges.add((min(a, b), max(a, b)))
    expected = []
    cur = set(edges)
    for _ in range(3):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 4}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        nodes = {v for e in cur for v in e}
        expected.append((len(nodes), len(cur)))
    got = {
        r["round"]: (r.n_nodes, r.n_edges)
        for r in kcore_decomposition(spark, SF_DIR).collect()
    }
    assert [got[1], got[2], got[3]] == expected


def test_ks_statistic_matches_bruteforce(spark, tmp_path):
    """KS over crafted distributions must equal the brute-force
    sup-norm of empirical CDF differences computed driver-side."""
    from spark_flink_streaming_example_with_test_spark.plans.llm import ks_drift_between_sources

    a_lens = [2, 2, 3, 5, 8]
    b_lens = [3, 5, 5, 9]
    # exact-token strings ("w " * k would split to k+1 tokens via
    # the trailing space -> empty token)
    texts = [" ".join(["w"] * k) for k in a_lens + b_lens]
    _write_docs(
        tmp_path, texts, sources=["src0"] * len(a_lens) + ["src1"] * len(b_lens)
    )
    r = ks_drift_between_sources(spark, str(tmp_path)).collect()[0]

    def cdf(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)

    pooled = sorted(set(a_lens + b_lens))
    expected = max(abs(cdf(a_lens, x) - cdf(b_lens, x)) for x in pooled)
    assert r.n_src0 == len(a_lens) and r.n_src1 == len(b_lens)
    assert abs(r.ks_stat - round(expected, 6)) < 1e-9


def test_new_text_queries_tolerate_null_text(spark, tmp_path):
    """NULL text rows must not crash (or poison) the round-8 text
    queries — NULL-scored docs drop out of aggregates naturally."""
    from spark_flink_streaming_example_with_test_spark.plans.llm import (
        flesch_reading_ease,
        ks_drift_between_sources,
        tokenizer_fertility_by_lang,
    )

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta gamma", None, "delta epsilon", None],
            "lang": ["en", "en", "de", "de"],
            "source": ["src0", "src0", "src1", "src1"],
            "n_chars": [16, 0, 13, 0],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    sf = str(tmp_path)
    assert flesch_reading_ease(spark, sf).count() >= 1
    assert tokenizer_fertility_by_lang(spark, sf).count() >= 1
    assert ks_drift_between_sources(spark, sf).count() >= 0
