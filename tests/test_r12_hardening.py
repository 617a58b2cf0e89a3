"""Round-12 hardening pins.

1. The scaled-integer (BIGINT ppm) half-up emission helpers equal
   exact decimal round-half-up in BOTH engines — the emission class
   that retires the r11 ``mcnemar_filter_agreement`` hash miss (a
   DOUBLE ``/1e6`` was the last float on that query's hash path).
2. ``bootstrap_mean_ci_events`` survives NEGATIVE event values via
   the offset-shift construction (ADVICE r11: ``(2*wx + wsum) DIV
   (2*wsum)`` is undefined for negative numerators — Spark ``div``
   truncates, DuckDB ``//`` floors) and still matches its oracle.
3. ``herfindahl_token_concentration`` excludes NULL text in both
   engines (ADVICE r11: Spark's legacy sizeOfNull returns -1 for
   NULL while the oracle's SUM skipped it — latent divergence).
4. The offset-shift leaves values IDENTICAL when no negatives exist
   (off = 0), so prior certifications still hold.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_flink_streaming_example_with_test_spark.plans import inference as inf
from tests.compare import assert_df_matches_oracle
from tests.conftest import SF_DIR


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),
            st.integers(min_value=1, max_value=10**7),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_half_up_scaled_matches_decimal_and_is_integral(spark, pairs):
    """half_up_scaled_*(p, q, 6) == round_half_up(p/q * 1e6) exactly,
    emitted as an INTEGER column in both engines (int64 Spark-side,
    BIGINT oracle-side) — no float ever touches the value."""
    from decimal import ROUND_HALF_UP, Decimal

    from spark_flink_streaming_example_with_test_spark.functions.numerics import (
        half_up_scaled_duck_sql,
        half_up_scaled_spark_sql,
    )

    df = spark.createDataFrame(pairs, "p long, q long")
    out = df.selectExpr(
        "p", "q", half_up_scaled_spark_sql("p", "q", 6) + " AS ppm"
    )
    assert dict(out.dtypes)["ppm"] == "bigint"
    got = {(r.p, r.q): r.ppm for r in out.collect()}
    con = duckdb.connect()
    for p, q in pairs:
        expected = int(
            (Decimal(p) * 10**6 / Decimal(q)).to_integral_value(
                rounding=ROUND_HALF_UP
            )
        )
        assert got[(p, q)] == expected, (p, q, got[(p, q)], expected)
        duck = con.execute(
            f"SELECT {half_up_scaled_duck_sql(str(p), str(q), 6)} AS v"
        ).fetchone()[0]
        assert duck == expected and isinstance(duck, int)
    con.close()


@pytest.fixture()
def negative_events_dir(tmp_path):
    """A tiny events fixture whose values include negatives — the
    input class the offset-shift exists for."""
    n = 200
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(range(n), unit="h"),
            "value": [
                ((i * 37) % 19 - 9) + ((i * 13) % 7) / 8.0
                for i in range(n)
            ],
        }
    )
    assert (df["value"] < 0).any() and (df["value"] > 0).any()
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_bootstrap_ci_negative_values_match_oracle(
    spark, negative_events_dir
):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{negative_events_dir}/events.parquet'"
    )
    sdf = inf.bootstrap_mean_ci_events(spark, negative_events_dir)
    assert_df_matches_oracle(
        sdf,
        con.sql(inf.BOOTSTRAP_MEAN_CI_ORACLE),
        context="bootstrap_mean_ci_events[negative values]",
    )
    row = sdf.collect()[0]
    # the point mean is genuinely negative-capable and the CI brackets it
    assert row.boot_ci_lo <= row.mean_value <= row.boot_ci_hi
    con.close()


def test_bootstrap_offset_is_identity_on_nonnegative_input(spark):
    """off = 0 on the real fixtures (no negative values), so the r12
    offset-shift must emit byte-identical values to the r11 form —
    pinning that the shift changed nothing certified."""
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{SF_DIR}/events.parquet'"
    )
    assert_df_matches_oracle(
        inf.bootstrap_mean_ci_events(spark, SF_DIR),
        con.sql(inf.BOOTSTRAP_MEAN_CI_ORACLE),
        context="bootstrap_mean_ci_events[off=0]",
    )
    con.close()


@pytest.fixture()
def null_text_docs_dir(tmp_path):
    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "source": ["s0", "s0", "s1", "s1", "s1", "s2", "s2", "s3"],
            "text": [
                "alpha beta gamma",
                "delta epsilon",
                "zeta eta theta iota",
                None,
                "kappa",
                None,
                "lambda mu nu xi omicron",
                None,  # source s3 has ONLY null text -> drops entirely
            ],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_herfindahl_null_text_matches_oracle(spark, null_text_docs_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{null_text_docs_dir}/documents.parquet'"
    )
    sdf = inf.herfindahl_token_concentration(spark, null_text_docs_dir)
    assert_df_matches_oracle(
        sdf,
        con.sql(inf.HERFINDAHL_ORACLE),
        context="herfindahl_token_concentration[null text]",
    )
    row = sdf.collect()[0]
    # all-NULL source s3 contributes nothing: 3 sources remain, and
    # no -1 sizeOfNull sentinel ever reaches the token sums
    assert row.n_sources == 3
    assert row.total_tokens == 3 + 2 + 4 + 1 + 5
    con.close()
