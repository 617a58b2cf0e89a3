"""Closed-form recount pins for ``dedup_spill_sizing_estimate``
(round 13, VERDICT r12 item #5).

The query turns the r12 256x finding — pair-frame dedup dies on
DISK, at ~3.5 bytes of shuffle per gram-level candidate row — into
the provisioning forecast an operator runs BEFORE the pair join.
These tests recount the prediction from raw fixture text in plain
Python (no Spark, no DuckDB SQL — a third implementation), and pin
the formula arithmetic the 256x receipts back-test relies on:
predicted_bytes = candidate_rows * 3.5 applied as exact integer
floor-divisions identically in both engines.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from spark_flink_streaming_example_with_test_spark.plans.inference import (
    _SPILL_BYTES_PER_CAND_ROW_X10,
    _SPILL_CAP,
    dedup_spill_sizing_estimate,
)

SF_DIR = "/root/testdata/sf0.001"


def _python_recount(sf_dir: str, k: int) -> dict:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    df_counter: Counter = Counter()
    for text in docs["text"]:
        if text is None:
            continue
        w = str(text).lower().split(" ")
        if len(w) < k:
            continue
        grams = {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
        df_counter.update(grams)
    c2_all = sum(d * (d - 1) for d in df_counter.values())
    c2_cap = sum(
        d * (d - 1) for d in df_counter.values() if d <= _SPILL_CAP
    )
    return {
        "n_grams": len(df_counter),
        "n_postings": sum(df_counter.values()),
        "hot_grams": sum(1 for d in df_counter.values() if d > _SPILL_CAP),
        "cand_rows_capped": c2_cap // 2,
        "cand_rows_uncapped": c2_all // 2,
        "pred_spill_bytes_capped": c2_cap * _SPILL_BYTES_PER_CAND_ROW_X10 // 20,
        "pred_spill_bytes_uncapped": c2_all
        * _SPILL_BYTES_PER_CAND_ROW_X10
        // 20,
    }


@pytest.fixture(scope="module")
def result(spark):
    out = dedup_spill_sizing_estimate(spark, SF_DIR).toPandas()
    return out.set_index("shingle_len")


@pytest.mark.parametrize("k", [3, 5, 8])
def test_recount_matches_engine(result, k):
    expect = _python_recount(SF_DIR, k)
    row = result.loc[k]
    for col, val in expect.items():
        assert int(row[col]) == val, (k, col, int(row[col]), val)


def test_formula_invariants(result):
    for k, row in result.iterrows():
        # 3.5 B/row as exact integer arithmetic: bytes == rows*7 div 2
        # (both derive from the even doubled pair count, so the two
        # floor-division routes agree exactly)
        assert int(row["pred_spill_bytes_uncapped"]) == (
            int(row["cand_rows_uncapped"]) * 7
        ) // 2
        assert int(row["pred_spill_bytes_capped"]) == (
            int(row["cand_rows_capped"]) * 7
        ) // 2
        assert int(row["pred_spill_mb_uncapped"]) == (
            int(row["pred_spill_bytes_uncapped"]) // 1048576
        )
        # the cap can only remove candidates, never add
        assert int(row["cand_rows_capped"]) <= int(row["cand_rows_uncapped"])
        # longer shingles => fewer repeated grams => the 8-gram leg
        # can never out-candidate the 3-gram leg on the same corpus
    assert (
        int(result.loc[8, "cand_rows_uncapped"])
        <= int(result.loc[3, "cand_rows_uncapped"])
    )


def test_256x_backtest_arithmetic():
    """The measured 256x receipt (PARITY.md r12): ~2e10 candidate
    rows spilled 60-95 GB per query. The formula must price that
    population inside the measured band — this is the constant's
    calibration check, independent of any fixture."""
    cand_rows_256x = 2e10
    pred_bytes = cand_rows_256x * _SPILL_BYTES_PER_CAND_ROW_X10 / 10
    assert 60e9 <= pred_bytes <= 95e9
