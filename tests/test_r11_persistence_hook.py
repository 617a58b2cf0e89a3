"""Round-11 sweep-hygiene hook (VERDICT r10 stretch item #9): the
heavy dedup persist sites register their frames with the opt-in
collector in ``functions/persistence.py``, so a harness running many
catalog queries in one session can release the gram/token caches
between queries instead of relying on LRU eviction. Normal (no
collector) operation must be byte-for-byte unaffected."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_flink_streaming_example_with_test_spark.functions import persistence as ps
from spark_flink_streaming_example_with_test_spark.operators import dedup as dd


def _corpus(spark, n=40):
    return spark.range(n).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha beta gamma delta"),
            (F.col("id") % 7).cast("string"),
            F.lit("epsilon zeta eta theta iota"),
        ).alias("text"),
    )


def test_no_collector_is_a_noop(spark):
    df = _corpus(spark)
    out = dd.ngram_jaccard_pairs(df, shingle_len=3, threshold=0.1)
    out.count()
    # registry untouched outside a scope
    assert ps._ACTIVE == []


def test_frames_released_after_scope(spark):
    df = _corpus(spark)
    with ps.unpersist_after() as frames:
        out = dd.ngram_jaccard_pairs(df, shingle_len=3, threshold=0.1)
        n_in = out.count()
        # the gram family persists the shingled frame + the flagged
        # inverted index
        assert len(frames) >= 2
        assert all(f.is_cached for f in frames)
    assert all(not f.is_cached for f in frames)
    # and the query result is unaffected by the release
    out2 = dd.ngram_jaccard_pairs(df, shingle_len=3, threshold=0.1)
    assert out2.count() == n_in


def test_scopes_nest_innermost_wins(spark):
    df = _corpus(spark, n=12)
    with ps.unpersist_after() as outer:
        with ps.unpersist_after() as inner:
            dd.ngram_jaccard_pairs(df, shingle_len=3, threshold=0.1).count()
            assert len(inner) >= 2
        assert all(not f.is_cached for f in inner)
        # outer collected nothing — inner scope owned the frames
        assert outer == []


def test_results_identical_with_and_without_hook(spark):
    df = _corpus(spark)
    plain = sorted(
        map(str, dd.ngram_jaccard_pairs(df, shingle_len=3, threshold=0.1).collect())
    )
    with ps.unpersist_after():
        hooked = sorted(
            map(
                str,
                dd.ngram_jaccard_pairs(df, shingle_len=3, threshold=0.1).collect(),
            )
        )
    assert plain == hooked


def test_capstone_tok_frame_registered(spark, sf_dir):
    from spark_flink_streaming_example_with_test_spark.plans.llm import dedup_method_comparison

    with ps.unpersist_after() as frames:
        out = dedup_method_comparison(spark, sf_dir)
        rows = out.collect()
        assert len(rows) == 6
        # tok frame + per-leg shingle/index persists all registered
        assert len(frames) >= 4
    assert all(not f.is_cached for f in frames)
