"""Plan-level performance regressions: the physical plans the
100 TB design depends on, asserted so a refactor can't silently
trade them away — filters/projection reaching the parquet scan,
dimensions broadcasting, partial-before-final aggregation."""

from __future__ import annotations

import pytest

from spark_flink_streaming_example_with_test_spark.plans.catalog import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_q6_scan_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    # only the 4 predicate/aggregate columns, not all 11
    assert "l_returnflag" not in schema and "l_partkey" not in schema
    for c in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert c in schema


def test_q3_broadcasts_customer_dim(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_all_dims(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    # region, nation, supplier all ride broadcast joins
    assert plan.count("BroadcastHashJoin") >= 3


def test_q1_partial_before_final_aggregate(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "partial_" in plan  # map-side combine present
    assert plan.count("Exchange") == 1  # single shuffle on group keys


def test_flagship_single_shuffle(spark):
    plan = _plan(spark, "activity_windowed_count")
    assert plan.count("Exchange") == 1


def test_minhash_signatures_no_shuffle(spark):
    """MinHash signatures must compute map-side: no exchange between
    the shingle projection and the signature projection (only the
    parallelism-guard round-robin repartition of the input)."""
    from spark_flink_streaming_example_with_test_spark.operators import dedup as dd
    from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

    # Earlier tests may have persisted the same shingle plan; the
    # cache manager would splice an InMemoryRelation in here and hide
    # the exchanges this test is about.
    spark.catalog.clearCache()
    docs = load_table(spark, SF_DIR, "documents")
    sigs = dd.minhash_signatures(dd.hashed_shingle_sets(docs))
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobin" in plan  # the parallelism guard
    assert plan.count("Exchange") == 1  # ...and nothing else


def test_topk_cosine_broadcasts_queries(spark):
    plan = _plan(spark, "similarity_topk_cosine")
    assert "Broadcast" in plan


def test_decontaminate_no_cartesian(spark):
    """Contamination check must be the inverted-index join on the
    gram key — never a doc x doc or gram x gram cartesian."""
    plan = _plan(spark, "decontaminate_ngrams")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_prunes_columns(spark):
    """The sampling predicate is derived from doc_id/source only —
    the scan must not read the document text."""
    plan = _plan(spark, "stratified_sample_by_source")
    schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" not in schema
    assert "doc_id" in schema and "source" in schema


def test_hyperplane_lsh_single_bucket_shuffle(spark):
    """The bucketed similarity self-join shuffles on the bucket id;
    the bucket projection itself is map-side (no exchange before
    the window/count that enforces the bucket cap) and there is no
    cartesian fallback."""
    plan = _plan(spark, "similarity_lsh_bucketed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
