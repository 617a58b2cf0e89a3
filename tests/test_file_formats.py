"""File-format scan coverage (SURVEY.md §2.6 row 1): CSV and JSON
scans must roundtrip the same rows the parquet fixtures hold,
with explicit schemas (schema inference is a full extra pass at
100 TB — never rely on it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_flink_streaming_example_with_test_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _normalized(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_csv_scan_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_csv")
    orders.write.option("header", True).csv(path)
    back = spark.read.schema(orders.schema).option("header", True).csv(path)
    assert _normalized(back) == _normalized(orders)


def test_json_scan_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_json")
    ev.write.json(path)
    back = spark.read.schema(ev.schema).json(path)
    assert _normalized(back) == _normalized(ev)


def test_csv_scan_pushes_filters(spark, tmp_path):
    """CSV scans still get filter pushdown (Spark's CSV source
    supports it) — the plan must show PushedFilters."""
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_csv2")
    orders.write.option("header", True).csv(path)
    back = (
        spark.read.schema(orders.schema).option("header", True).csv(path)
        .filter(F.col("o_orderkey") == 42)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "o_orderkey" in plan.split("PushedFilters")[1].split("]")[0]


def test_synthetic_generator_partition_invariant(spark):
    """The S8 generator must produce IDENTICAL rows regardless of
    parallelism — the property that makes synthetic corpora
    reproducible on any cluster size (unlike the reference's
    random/faker producer)."""
    from spark_flink_streaming_example_with_test_spark.sources.generator import synthetic_activity

    one = sorted(map(tuple, synthetic_activity(spark, 500, num_partitions=1).collect()))
    many = sorted(map(tuple, synthetic_activity(spark, 500, num_partitions=8).collect()))
    assert one == many
    assert len(one) == 500
    users = {r[0] for r in one}
    assert users == set(range(1, 11))


def test_orc_scan_roundtrip_and_pushdown(spark, tmp_path):
    """ORC is the other columnar format a lakehouse feeds us; the
    native reader must roundtrip and keep predicate pushdown +
    column pruning, same as parquet."""
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    orders.write.orc(path)
    back = spark.read.schema(orders.schema).orc(path)
    assert _normalized(back) == _normalized(orders)

    probe = back.filter(F.col("o_orderkey") == 42).select("o_orderstatus")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "o_orderkey" in plan.split("PushedFilters")[1].split("]")[0]
    schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "o_totalprice" not in schema
