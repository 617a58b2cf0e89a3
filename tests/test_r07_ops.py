"""Targeted unit tests for the round-7 operators, on crafted inputs
that pin the semantics the fixture-scale oracle parity can't isolate:
exact BPE pair arithmetic, boilerplate threshold behavior, range-join
bucket-boundary inclusivity, and linear-scorer determinism."""

from __future__ import annotations

import pandas as pd

from spark_flink_streaming_example_with_test_spark.plans.analytics import range_join_bucketed
from spark_flink_streaming_example_with_test_spark.plans.llm import (
    boilerplate_strip_stats,
    bpe_first_merges,
    quality_linear_classifier,
)


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_bpe_first_merges_golden(spark, tmp_path):
    """'aaab aaab ab' -> word counts {aaab:2, ab:1}; pair counts:
    aa: 2 words x 2 positions = 4, ab: 2+1 = 3."""
    sf = _write_docs(tmp_path, ["aaab aaab ab"])
    got = {r.pair: r.pair_count for r in bpe_first_merges(spark, sf).collect()}
    assert got == {"aa": 4, "ab": 3}


def test_boilerplate_strip_thresholds(spark, tmp_path):
    """A segment repeated in 3 docs is stripped everywhere; a
    segment in only 2 docs survives; tail tokens under one segment
    length never count."""
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"           # freq 3 -> stripped
    rare = "r1 r2 r3 r4 r5 r6 r7 r8"             # freq 2 -> kept
    texts = [
        boiler + " " + rare,                      # 16 tokens, strips 8
        boiler + " " + rare,                      # same
        boiler + " tail word",                    # 10 tokens, strips 8
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r.doc_id: r for r in boilerplate_strip_stats(spark, sf).collect()}
    assert rows[0].tokens_before == 16 and rows[0].tokens_after == 8
    assert rows[0].segments_removed == 1
    assert rows[2].tokens_before == 10 and rows[2].tokens_after == 2
    assert rows[2].segments_removed == 1


def test_quality_linear_classifier_deterministic_and_bounded(spark, tmp_path):
    sf = _write_docs(
        tmp_path, ["alpha beta gamma delta", "zeta eta theta", "one two"]
    )
    first = sorted(map(tuple, quality_linear_classifier(spark, sf).collect()))
    second = sorted(map(tuple, quality_linear_classifier(spark, sf).collect()))
    assert first == second
    for _, _, score, accept in first:
        assert 0.0 < score < 1.0
        assert accept == (score >= 0.5)


def test_range_join_bucketed_boundary_and_cross_bucket(spark, tmp_path):
    """Pairs exactly 1800 s apart are IN (inclusive); 1801 s is out;
    pairs straddling a bucket boundary are found exactly once."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: 3 events — (a,b) 1800s apart (in), (a,c) 1801s (out),
        # (b,c) 1s apart (in)
        (1, 10, base),
        (1, 11, base + pd.Timedelta(seconds=1800)),
        (1, 12, base + pd.Timedelta(seconds=1801)),
        # user 2: straddles the 1800-s bucket edge: 1799s vs 1801s
        # epoch -> different buckets, 2s apart -> exactly one pair
        (2, 20, base + pd.Timedelta(seconds=1799)),
        (2, 21, base + pd.Timedelta(seconds=1801)),
    ]
    pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts"]
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.user_id: (r.n_pairs, r.max_gap_sec)
        for r in range_join_bucketed(spark, str(tmp_path)).collect()
    }
    assert got[1] == (2, 1800)
    assert got[2] == (1, 2)


def test_quantile_normalize_uniform_output(spark, tmp_path):
    """Any raw score distribution maps to exactly {0, 1/(n-1), ...,
    1} per source — the property quantile normalization exists for."""
    from spark_flink_streaming_example_with_test_spark.plans.analytics import quantile_normalize_scores

    texts = ["a a a a", "a b c d", "a a b b", "a b b b", "x y z w v"]
    sf = _write_docs(tmp_path, texts)
    row = quantile_normalize_scores(spark, sf).first()
    assert row.n_docs == 5
    assert row.min_quantile == 0.0 and row.max_quantile == 1.0
    assert row.mean_quantile == 0.5


def test_cross_lingual_pairs_exclude_same_language(spark, tmp_path):
    """A 5-gram shared within one language must NOT pair; the same
    overlap across languages must."""
    import pandas as pd

    from spark_flink_streaming_example_with_test_spark.plans.llm import dedup_cross_lingual

    shared = "one two three four five six seven"
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [shared, shared, shared],
            "lang": ["en", "en", "de"],
            "source": ["s"] * 3,
            "n_chars": [len(shared)] * 3,
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = dedup_cross_lingual(spark, str(tmp_path)).collect()
    got = {(r.lang_a, r.lang_b): r.n_pairs for r in rows}
    # en-en pair (0,1) excluded; en-de pairs (0,2) and (1,2) kept
    assert got == {("en", "de"): 2}


def test_boilerplate_strip_short_docs_omitted(spark, tmp_path):
    """Docs with < 8 tokens form no segment and are OMITTED from the
    output (mirror of the oracle's LEN(w) >= 8) — never emitted with
    phantom segments / negative token counts (round-7 ADVICE high:
    unguarded sequence(0, -1) walks downward to [0, -1])."""
    texts = ["a b c", "x y", "b1 b2 b3 b4 b5 b6 b7 b8 tail"]
    sf = _write_docs(tmp_path, texts)
    rows = {r.doc_id: r for r in boilerplate_strip_stats(spark, sf).collect()}
    assert set(rows) == {2}
    assert rows[2].tokens_before == 9
    assert rows[2].segments_removed == 0  # corpus freq 1 < 3
    assert rows[2].tokens_after == 9


def test_curation_capstone_short_docs_no_phantom_tokens(spark, tmp_path):
    """ADVICE repro: three 3-token duplicate docs must not produce
    negative tokens_kept via phantom boilerplate segments. Every doc
    is shorter than one segment, so tokens_after == n_tokens and
    tokens_kept == 3 * n_kept exactly."""
    from spark_flink_streaming_example_with_test_spark.plans.llm import curation_pipeline_capstone

    sf = _write_docs(tmp_path, ["a b c", "a b c", "a b c"])
    rows = curation_pipeline_capstone(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_kept + r.n_dropped_quality + r.n_dropped_duplicate == 3
    assert r.tokens_kept == 3 * r.n_kept
    assert r.tokens_kept >= 0


def test_quantile_normalize_single_doc_source(spark, tmp_path):
    """A single-doc source is 0/0 in (rank-1)/(n-1): Spark's Divide
    returns NULL, DuckDB returns NaN. Both engines must pin the
    degenerate case to quantile 0.5 (round-7 ADVICE, low)."""
    import duckdb
    import pandas as pd

    from spark_flink_streaming_example_with_test_spark.plans.analytics import (
        QUANTILE_NORMALIZE_ORACLE,
        quantile_normalize_scores,
    )

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["solo doc here", "alpha beta", "gamma gamma delta"],
            "lang": ["en"] * 3,
            "source": ["lonely", "busy", "busy"],
            "n_chars": [13, 10, 17],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.source: r
        for r in quantile_normalize_scores(spark, str(tmp_path)).collect()
    }
    assert rows["lonely"].mean_quantile == 0.5
    assert rows["lonely"].min_quantile == 0.5
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.execute(QUANTILE_NORMALIZE_ORACLE).fetchdf()
    orow = odf[odf.source == "lonely"].iloc[0]
    assert float(orow.mean_quantile) == 0.5
    brow = odf[odf.source == "busy"].iloc[0]
    assert float(brow.mean_quantile) == 0.5
    assert float(brow.min_quantile) == 0.0
    assert float(brow.max_quantile) == 1.0
    assert rows["busy"].min_quantile == 0.0 and rows["busy"].max_quantile == 1.0
