"""Closed-form recount pins for the round-13 capacity-planning
batch (plans/capacity.py) — a third implementation in plain pandas,
independent of both engines, same posture as
tests/test_r12_experiments.py.
"""

from __future__ import annotations

import pandas as pd
import pytest

from spark_flink_streaming_example_with_test_spark.plans import capacity as cap

SF_DIR = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _strlen(s) -> int:
    return 0 if s is None else len(str(s))


def test_shuffle_partition_plan_recount(spark):
    out = cap.shuffle_partition_plan(spark, SF_DIR).toPandas().iloc[0]
    ev = _events()
    est = int(
        sum(
            8 + 8 + 8 + 8 + _strlen(t) + _strlen(p)
            for t, p in zip(ev["event_type"], ev["props"])
        )
    )
    target = cap._TARGET_SHUFFLE_PARTITION_BYTES
    assert int(out["n_rows"]) == len(ev)
    assert int(out["est_total_bytes"]) == est
    assert int(out["rec_shuffle_partitions"]) == max(
        1, (est + target - 1) // target
    )
    assert int(out["est_bytes_per_row"]) == est // len(ev)


def test_broadcast_fit_audit_recount(spark):
    out = (
        cap.broadcast_fit_audit(spark, SF_DIR)
        .toPandas()
        .set_index("tbl")
    )
    assert list(out.index) == sorted(out.index)  # ORDER BY tbl
    region = pd.read_parquet(f"{SF_DIR}/region.parquet")
    est = int(
        sum(4 + _strlen(n) for n in region["r_name"])
        + len(region) * cap._ROW_OVERHEAD
    )
    row = out.loc["region"]
    assert int(row["n_rows"]) == len(region)
    assert int(row["est_bytes"]) == est
    assert int(row["fits_broadcast"]) == int(
        est <= cap._BROADCAST_THRESHOLD_BYTES
    )
    # at fixture scale every dim fits the 10 MiB default
    assert set(out.index) == {"region", "nation", "supplier",
                              "customer", "part"}


def test_hash_partition_skew_recount(spark):
    out = cap.hash_partition_skew_audit(spark, SF_DIR).toPandas().iloc[0]
    ev = _events()
    counts = ev.groupby(ev["user_id"] % cap._N_BUCKETS).size()
    total, mx = int(counts.sum()), int(counts.max())
    assert int(out["total_rows"]) == total
    assert int(out["buckets_used"]) == len(counts)
    assert int(out["max_bucket_rows"]) == mx
    assert int(out["min_bucket_rows"]) == int(counts.min())
    # exact half-up ppm of max / (total / N)
    expect = (mx * cap._N_BUCKETS * 2_000_000 + total) // (2 * total)
    assert int(out["skew_ratio_ppm"]) == expect


def test_cache_sizing_recount(spark):
    out = cap.cache_sizing_estimate(spark, SF_DIR).toPandas().iloc[0]
    docs = _docs()
    texts = [t for t in docs["text"] if t is not None]
    raw = sum(len(t) + 8 for t in texts)
    tok = sum(
        (len(t) - (len(t.lower().split(" ")) - 1))
        + 8 * len(t.lower().split(" "))
        + 8
        + cap._ROW_OVERHEAD
        for t in texts
    )
    assert int(out["n_docs"]) == len(texts)
    assert int(out["raw_est_bytes"]) == raw
    assert int(out["token_frame_est_bytes"]) == tok
    assert int(out["amplification_ppm"]) == (tok * 2_000_000 + raw) // (
        2 * raw
    )
    # tokenizing always amplifies (offsets + overhead)
    assert int(out["amplification_ppm"]) > 1_000_000


def test_target_file_compaction_recount(spark):
    out = (
        cap.target_file_compaction_plan(spark, SF_DIR).toPandas().iloc[0]
    )
    docs = _docs()
    est = int(
        sum(
            8 + 8 + _strlen(t) + _strlen(la) + _strlen(s)
            for t, la, s in zip(docs["text"], docs["lang"], docs["source"])
        )
    )
    target = cap._TARGET_FILE_BYTES
    files = max(1, (est + target - 1) // target)
    assert int(out["n_docs"]) == len(docs)
    assert int(out["est_total_bytes"]) == est
    assert int(out["n_output_files"]) == files
    assert int(out["docs_per_file"]) == len(docs) // files


def test_join_strategy_advisor_recount(spark):
    out = (
        cap.join_strategy_advisor(spark, SF_DIR)
        .toPandas()
        .set_index("join_name")
    )
    assert list(out.index) == sorted(out.index)
    # recount one dim edge and one fact edge against the byte model
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    nation_bytes = int(
        sum(4 + 4 + _strlen(n) for n in nation["n_name"])
        + len(nation) * cap._ROW_OVERHEAD
    )
    row = out.loc["customer_nation"]
    assert int(row["build_rows"]) == len(nation)
    assert int(row["build_est_bytes"]) == nation_bytes
    assert int(row["broadcast_ship_bytes"]) == (
        nation_bytes * cap._EXECUTOR_COUNT
    )
    assert int(row["smj_shuffle_bytes"]) == (
        nation_bytes + int(row["probe_est_bytes"])
    )
    assert row["advised"] == (
        "broadcast_hash"
        if nation_bytes <= cap._BROADCAST_THRESHOLD_BYTES
        else "sort_merge"
    )
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    orders_bytes = int(
        sum(
            8 + 8 + 8 + 8 + _strlen(s) + _strlen(p)
            for s, p in zip(orders["o_orderstatus"], orders["o_orderpriority"])
        )
        + len(orders) * cap._ROW_OVERHEAD
    )
    row = out.loc["lineitem_orders"]
    assert int(row["build_est_bytes"]) == orders_bytes
    # the advisor's build sides must agree with the plan pins: every
    # edge the headline TPC-H plans broadcast is advised broadcast
    # at fixture scale
    assert set(out["advised"]) == {"broadcast_hash"}


def test_streaming_state_sizing_recount(spark):
    out = (
        cap.streaming_state_sizing_plan(spark, SF_DIR)
        .toPandas()
        .set_index("operator")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").dropna(subset=["ts"])
    # normalize to epoch MICROS regardless of pandas' parquet
    # resolution ([ns] vs [us] varies by pandas/arrow version)
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    max_us = int(us.max())
    win = us - (us % cap._WINDOW_US)
    keys = pd.DataFrame(
        {"u": ev["user_id"], "t": ev["event_type"], "w": win}
    ).drop_duplicates()
    live = keys["w"] + cap._WINDOW_US > max_us - cap._WATERMARK_US
    entry = 8 + 16 + 8 + cap._STATE_ENTRY_OVERHEAD
    row = out.loc["windowed_count"]
    assert int(row["total_state_keys"]) == len(keys)
    assert int(row["live_state_keys"]) == int(live.sum())
    assert int(row["est_total_state_bytes"]) == int(
        (entry + keys["t"].str.len()).sum()
    )
    # r14: the session leg models one state entry per SESSION
    # (gaps-and-islands), matching the engine's measured state rows
    # exactly (x256 back-test, SCALE_NOTES r14) — recount with an
    # independent pandas groupby/shift construction.
    sev = pd.DataFrame({"u": ev["user_id"].values, "us": us.values})
    sev = sev.sort_values(["u", "us"], kind="mergesort")
    lag = sev.groupby("u")["us"].shift()
    new_sess = lag.isna() | (sev["us"] - lag > cap._SESSION_GAP_US)
    sess_id = new_sess.groupby(sev["u"].values).cumsum()
    sess_last = sev.groupby([sev["u"].values, sess_id.values])["us"].max()
    live_s = sess_last + cap._SESSION_GAP_US > max_us - cap._WATERMARK_US
    row = out.loc["session_window"]
    assert int(row["total_state_keys"]) == len(sess_last)
    assert int(row["live_state_keys"]) == int(live_s.sum())
    assert int(row["est_total_state_bytes"]) == len(sess_last) * entry
    tot, lv = len(keys), int(live.sum())
    assert int(out.loc["windowed_count", "live_fraction_ppm"]) == (
        lv * 2_000_000 + tot
    ) // (2 * tot)


def test_partition_pruning_recount(spark):
    out = cap.partition_pruning_audit(spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").dropna(subset=["ts"])
    days = ev["ts"].dt.strftime("%Y-%m-%d")
    counts = days.value_counts()
    max_day = max(counts.index)
    cutoff = (
        pd.Timestamp(max_day) - pd.Timedelta(days=cap._PRUNE_WINDOW_DAYS - 1)
    ).strftime("%Y-%m-%d")
    scanned = [d for d in counts.index if d >= cutoff]
    assert int(out["total_partitions"]) == len(counts)
    assert int(out["scanned_partitions"]) == len(scanned)
    assert int(out["total_rows"]) == len(ev)
    assert int(out["scanned_rows"]) == int(
        sum(counts[d] for d in scanned)
    )
    tot, sc = len(counts), len(scanned)
    assert int(out["partition_prune_ppm"]) == (
        (tot - sc) * 2_000_000 + tot
    ) // (2 * tot)


def test_dict_compression_recount(spark):
    out = (
        cap.dict_compression_estimate(spark, SF_DIR)
        .toPandas()
        .set_index("column_name")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    vals = ev["event_type"].dropna()
    ndv = vals.nunique()
    plain = int(vals.str.len().sum())
    bits = (ndv - 1).bit_length() if ndv > 1 else 0
    dict_len = int(sum(len(v) for v in vals.unique()))
    dict_bytes = dict_len + (len(vals) * bits + 7) // 8
    row = out.loc["events.event_type"]
    assert int(row["ndv"]) == ndv
    assert int(row["index_bits"]) == bits
    assert int(row["plain_bytes"]) == plain
    assert int(row["dict_bytes"]) == dict_bytes
    assert int(row["dict_ratio_ppm"]) == (
        dict_bytes * 2_000_000 + plain
    ) // (2 * plain)
    # low-cardinality columns must actually compress
    assert int(row["dict_ratio_ppm"]) < 1_000_000


def test_bloom_filter_sizing_recount(spark):
    out = (
        cap.bloom_filter_sizing(spark, SF_DIR)
        .toPandas()
        .set_index("key_name")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ndv = int(ev["user_id"].dropna().nunique())
    bits = ndv * cap._BLOOM_BITS_PER_KEY_PPM // 10**6
    row = out.loc["events.user_id"]
    assert int(row["ndv"]) == ndv
    assert int(row["bloom_bits"]) == bits
    assert int(row["bloom_bytes"]) == (bits + 7) // 8
    assert int(row["hash_count"]) == cap._BLOOM_HASHES
    assert set(out.index) == {
        "events.user_id", "lineitem.l_partkey", "orders.o_custkey"
    }


def test_aqe_coalesce_recount(spark):
    out = cap.aqe_coalesce_estimate(spark, SF_DIR).toPandas().iloc[0]
    ev = _events()
    n = int(ev["user_id"].dropna().nunique())
    est = n * (8 + 8 + cap._ROW_OVERHEAD)
    after = max(
        1, (est + cap._AQE_ADVISORY_BYTES - 1) // cap._AQE_ADVISORY_BYTES
    )
    before = cap._SESSION_SHUFFLE_PARTITIONS
    assert int(out["n_groups"]) == n
    assert int(out["est_agg_bytes"]) == est
    assert int(out["partitions_before_aqe"]) == before
    assert int(out["partitions_after_aqe"]) == after
    if after < before:
        assert int(out["coalesce_reduction_ppm"]) == (
            (before - after) * 2_000_000 + before
        ) // (2 * before)
    # the tiny post-agg frame must coalesce hard at fixture scale
    assert after == 1


def test_executor_fleet_recount(spark):
    out = cap.executor_fleet_plan(spark, SF_DIR).toPandas().iloc[0]
    ev = _events()
    est = int(
        sum(
            8 + 8 + 8 + 8 + _strlen(t) + _strlen(p)
            for t, p in zip(ev["event_type"], ev["props"])
        )
    )
    tgt = cap._TARGET_CORPUS_BYTES
    assert int(out["fixture_bytes"]) == est
    assert int(out["projected_rows"]) == tgt * len(ev) // est
    core_sec = (
        tgt + cap._SCAN_BYTES_PER_CORE_SEC - 1
    ) // cap._SCAN_BYTES_PER_CORE_SEC
    assert int(out["scan_core_seconds"]) == core_sec
    denom = cap._TARGET_WALL_SECONDS * cap._CORES_PER_EXECUTOR
    assert int(out["executors_for_1h_scan"]) == (
        core_sec + denom - 1
    ) // denom
