"""Robustness: NULL text / NULL keys flowing through the dedup and
text operators — a different failure surface than the zero-row sweep
(test_empty_inputs.py): NULL is a value, so it reaches expression
code that empty inputs never execute. Contract: no exception, and
NULL-text rows are excluded from gram/token computations rather than
producing phantom rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_flink_streaming_example_with_test_spark.operators.dedup import (
    cdc_chunks,
    exact_duplicates,
    ngram_jaccard_pairs,
    segment_duplication_stats,
    shared_gram_pairs,
    simhash64,
)
from spark_flink_streaming_example_with_test_spark.operators.text import with_token_stats


def _docs_with_nulls(spark):
    text = " ".join(f"w{i}" for i in range(12))
    return spark.createDataFrame(
        [(1, text), (2, text), (3, None), (4, "")],
        "doc_id long, text string",
    )


def test_gram_operators_skip_null_text(spark):
    df = _docs_with_nulls(spark)
    # Only the duplicated pair (1, 2) may appear; the NULL-text and
    # empty-text docs contribute no grams and no exception.
    jac = ngram_jaccard_pairs(df, shingle_len=3, threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in jac] == [(1, 2)]
    shared = shared_gram_pairs(df, window_len=8).collect()
    assert [(r.id_a, r.id_b) for r in shared] == [(1, 2)]


def test_exact_duplicates_groups_null_and_empty_separately(spark):
    df = _docs_with_nulls(spark)
    rows = {r.keep_id: r.n_copies for r in exact_duplicates(df).collect()}
    # duplicated pair collapses to keep_id 1; NULL text and empty
    # text each survive as their own group (distinct fingerprints).
    assert rows[1] == 2
    assert rows.get(3) == 1 and rows.get(4) == 1


def test_segment_and_chunk_operators_survive_null_text(spark):
    df = _docs_with_nulls(spark)
    seg = segment_duplication_stats(df, seg_len=8).collect()
    assert {r.doc_id for r in seg} <= {1, 2}  # shorts + NULL excluded
    chunks = cdc_chunks(df).collect()
    # NULL text explodes to zero rows; empty text is one "" token.
    assert {r.doc_id for r in chunks} <= {1, 2, 4}


def test_simhash_and_token_stats_survive_null_text(spark):
    df = _docs_with_nulls(spark)
    sh = simhash64(df).collect()
    assert {r.doc_id for r in sh} == {1, 2, 4}  # NULL contributes no tokens
    stats = with_token_stats(df).collect()
    assert len(stats) == 4  # row-preserving projection keeps NULL row


def test_fixture_documents_have_no_null_text(spark, sf_dir):
    """Canary for the size(split(NULL)) = -1 class (ADVICE r13 #1):
    ~25 catalog queries compute doc length as F.size(F.split(text))
    without a NULL guard, which is exact vs their DuckDB oracles
    ONLY because the documents fixtures contain no NULL text (under
    Spark's default non-ANSI config size(split(NULL, ' ')) returns
    -1, not NULL, while DuckDB aggregates skip NULL — a silent
    cross-engine divergence). hybrid_search_rrf guards explicitly
    (plans/llm.py); the rest rely on this fixture property. If this
    test ever fails, the fixture generation changed — audit every
    unguarded `F.size(F.split` site (grep) before trusting the gate.
    """
    from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert docs.filter(F.col("text").isNull()).count() == 0
