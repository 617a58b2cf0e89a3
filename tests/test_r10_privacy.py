"""Round-10 batch-8 semantic pins for the privacy & sampling
governance queries (plans/measures.py tail): k-anonymity audit,
largest-remainder stratified allocation, and blocking candidate-pair
estimation — each against an independent brute-force Python
recomputation, plus the structural invariants the DuckDB-parity hash
can't express (suppression monotone in k, allocation sums exactly to
the budget and respects the quota rule, candidate pairs bounded by
the unblocked total).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from spark_flink_streaming_example_with_test_spark.plans import measures as me
from tests.conftest import SF_DIR


def _half_up(num: int, den: int, k: int) -> float:
    scale = 10**k
    return ((2 * num * scale + den) // (2 * den)) / scale


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_k_anonymity_matches_bruteforce(spark, duck):
    df = duck.sql(
        f"SELECT c_nationkey, c_mktsegment, c_acctbal"
        f" FROM '{SF_DIR}/customer.parquet'"
    ).df()
    sizes = Counter(
        (r.c_nationkey, r.c_mktsegment, math.floor(r.c_acctbal / 1000.0))
        for r in df.itertuples()
    )
    n_groups, n_rows = len(sizes), sum(sizes.values())
    k_min = min(sizes.values())

    rows = me.k_anonymity_audit(spark, SF_DIR).collect()
    assert [r["k"] for r in rows] == [2, 5, 10, 25]
    prev_g = prev_r = -1
    for r in rows:
        small = [s for s in sizes.values() if s < r["k"]]
        assert r["n_groups"] == n_groups
        assert r["n_rows"] == n_rows
        assert r["k_min"] == k_min
        assert r["n_small_groups"] == len(small)
        assert r["n_suppressed_rows"] == sum(small)
        assert r["suppressed_share"] == _half_up(sum(small), n_rows, 6)
        # suppression is monotone non-decreasing in k
        assert r["n_small_groups"] >= prev_g and r["n_suppressed_rows"] >= prev_r
        prev_g, prev_r = r["n_small_groups"], r["n_suppressed_rows"]


def test_stratified_allocation_matches_bruteforce(spark, duck):
    df = duck.sql(
        f"SELECT source, lang, COUNT(*) AS n"
        f" FROM '{SF_DIR}/documents.parquet' GROUP BY 1, 2"
    ).df()
    strata = {(r.source, r.lang): int(r.n) for r in df.itertuples()}
    total = sum(strata.values())
    budget = total // 5
    base = {k: budget * n // total for k, n in strata.items()}
    rem = {k: (budget * strata[k]) % total for k in strata}
    leftover = budget - sum(base.values())
    order = sorted(strata, key=lambda k: (-rem[k], k[0], k[1]))
    alloc = dict(base)
    for k in order[:leftover]:
        alloc[k] += 1

    rows = me.stratified_sample_allocation(spark, SF_DIR).collect()
    assert len(rows) == len(strata)
    got_total = 0
    for r in rows:
        k = (r["source"], r["lang"])
        assert r["n_docs"] == strata[k]
        assert r["allocated"] == alloc[k]
        assert r["budget"] == budget
        assert r["sums_to_budget"] is True
        assert r["sampling_rate"] == _half_up(alloc[k], strata[k], 6)
        # quota rule: within 1 of the exact proportional share, and
        # never more than the stratum holds (B <= N)
        exact = budget * strata[k] / total
        assert math.floor(exact) <= r["allocated"] <= math.ceil(exact) + 0
        assert r["allocated"] <= strata[k]
        got_total += r["allocated"]
    assert got_total == budget  # Hamilton apportionment sums exactly


def test_blocking_pairs_match_bruteforce(spark, duck):
    df = duck.sql(
        f"SELECT lang, source, text, n_chars"
        f" FROM '{SF_DIR}/documents.parquet'"
    ).df()
    strategies = {
        "lang": lambda r: r.lang,
        "source_lang": lambda r: f"{r.source}/{r.lang}",
        "text_prefix8": lambda r: r.text[:8].lower(),
        "len_band64": lambda r: str(int(r.n_chars) // 64),
    }
    expected = {}
    n = len(df)
    for name, keyf in strategies.items():
        blocks = Counter(keyf(r) for r in df.itertuples())
        pairs = sum(m * (m - 1) // 2 for m in blocks.values())
        expected[name] = (len(blocks), max(blocks.values()), pairs)

    rows = me.blocking_candidate_pairs(spark, SF_DIR).collect()
    assert sorted(expected) == [r["strategy"] for r in rows]
    total_pairs = n * (n - 1) // 2
    for r in rows:
        nb, mx, pairs = expected[r["strategy"]]
        assert r["n_blocks"] == nb
        assert r["max_block"] == mx
        assert r["candidate_pairs"] == pairs
        assert r["total_pairs"] == total_pairs
        assert r["candidate_pairs"] <= r["total_pairs"]
        assert r["reduction_ratio"] == _half_up(
            n * (n - 1) - 2 * pairs, n * (n - 1), 6
        )
