"""Cross-engine-exact numeric emission helpers.

The repo's correctness gate hash-compares STRINGIFIED Spark output
against a DuckDB oracle. Two classes of double arithmetic diverge
between the engines even when both are "correct":

1. ``ROUND(p/q, k)`` where p, q are integers: the true quotient can
   land EXACTLY on a decimal half boundary (e.g. 77706/2400000 =
   0.0323775) and Spark rounds the shortest decimal string half-up
   while DuckDB rounds the binary double — a one-ULP last-digit
   divergence found four separate times by the replica-scale parity
   hunts (rounds 7-8).
2. ``AVG``/``SUM`` over doubles: partial sums associate differently
   across partitions/engines, so the low bits (and occasionally a
   coarse ROUND of them) are order-dependent.

Both are retired by keeping the arithmetic in INTEGERS until one
final division: round-half-up(p/q, k) == (2*p*10^k + q) div (2*q) /
10^k exactly, for p >= 0, q > 0 (property-tested against
decimal.Decimal ROUND_HALF_UP in tests/test_properties.py). This
module is the one shared spelling of that construction — Spark SQL
text for ``selectExpr``/``spark.sql`` plans and DuckDB text for the
oracle twins — so new ratio-emitting queries stop re-deriving it
inline.

Text, not Column API, deliberately: true integral division (`div` /
`//`) has no pyspark Column function, and the tempting substitutes
are NOT exact — ``F.floor(decimal_a / decimal_b)`` rounds the
quotient half-up at the result scale BEFORE the floor (a quotient of
12.9999996 floors to 13), and double division loses low bits. The
``selectExpr`` spelling below is the exact form already green
through the 8x-replica parity sweep.

Overflow posture: ``2*p*10^k`` must stay inside the accumulating
type. CAST per-row integers to DECIMAL(38,0) Spark-side / HUGEINT
oracle-side before summing when the product can pass int64 (~9.2e18)
— Spark ``div`` accepts decimal operands and returns BIGINT, and the
final ``/ 1e{k}`` emits DOUBLE either way, so the wrapped form keeps
the same output schema. Negative numerators are NOT supported: Spark
``div`` truncates toward zero while DuckDB ``//`` floors, so they
would diverge — offset-shift into non-negatives first, as
flesch_reading_ease does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up_ratio_col(num: Column, den: Column, k: int) -> Column:
    """Column-side exact half-up for SMALL integer operands (per-row
    ratios like stop-hits/token-count): ``floor((2*num*10^k + den) /
    (2*den)) / 10^k`` with the division in DOUBLE. Exact whenever
    ``2*num*10^k + den < 2^53``: both operands are then exactly
    representable, an integer quotient divides exactly, and a
    non-integer quotient sits >= 1/(2*den) away from the nearest
    integer while the division's rounding error is < q*2^-53 <
    1/(2*den) — so the floor can never cross. For per-SOURCE
    aggregates whose numerators can pass that bound, use the
    `div`-based text helpers with DECIMAL accumulation instead.
    Requires num >= 0, den > 0 (NULL propagates as NULL)."""
    scale = 10**k
    return F.floor(
        (num * F.lit(2 * scale) + den) / (den * F.lit(2))
    ) / F.lit(float(scale))


def half_up_ratio_sql(num_sql: str, den_sql: str, k: int) -> str:
    """Spark SQL text twin of :func:`half_up_ratio_col` — the SAME
    floor((2*num*10^k + den) / (2*den)) / 10^k tree with the double
    division, for builders that assemble expressions as strings
    (r14: one F.expr parse replaces ~10 py4j Column calls). Values
    and exactness bounds identical to the Column form by
    construction."""
    scale = 10**k
    return (
        f"floor((({num_sql}) * {2 * scale} + ({den_sql}))"
        f" / (({den_sql}) * 2)) / {float(scale)!r}D"
    )


def half_up_spark_sql(num_sql: str, den_sql: str, k: int) -> str:
    """round-half-up(num/den, k) as Spark SQL text (for
    ``selectExpr`` / ``spark.sql``): ``((num*2*10^k + den) div
    (2*den)) / 1e{k}``. Requires num >= 0, den > 0. Emits DOUBLE."""
    scale = 10**k
    return (
        f"((({num_sql}) * {2 * scale} + ({den_sql}))"
        f" div (2 * ({den_sql}))) / 1e{k}"
    )


def half_up_duck_sql(num_sql: str, den_sql: str, k: int) -> str:
    """DuckDB oracle twin of :func:`half_up_spark_sql`:
    ``((num*2*10^k + den) // (2*den)) / 1e{k}``. The numerator is
    CAST to HUGEINT internally — DuckDB types small literals/counts
    INT32 and errors loudly on product overflow (unlike Spark's
    silent wrap), and the widening costs nothing in an oracle."""
    scale = 10**k
    return (
        f"((CAST({num_sql} AS HUGEINT) * {2 * scale} + ({den_sql}))"
        f" // (2 * ({den_sql}))) / 1e{k}"
    )


def half_up_scaled_spark_sql(num_sql: str, den_sql: str, k: int) -> str:
    """round-half-up(num/den, k) emitted as the SCALED INTEGER
    ``round(num/den * 10^k)`` — BIGINT, never DOUBLE: ``(num*2*10^k +
    den) div (2*den)``. The all-integer emission for hash-gated
    columns: the plain helpers' trailing ``/ 1e{k}`` puts one DOUBLE
    division on the driver's hash path, and the r11 gate produced a
    hash-only miss (``mcnemar_filter_agreement``) on values that are
    bit-identical across both engines locally — the only remaining
    degree of freedom was the driver environment's float
    canonicalization of that division. A BIGINT column removes the
    class. Requires num >= 0, den > 0, same as the DOUBLE form."""
    scale = 10**k
    return (
        f"CAST((({num_sql}) * {2 * scale} + ({den_sql}))"
        f" div (2 * ({den_sql})) AS BIGINT)"
    )


def half_up_scaled_duck_sql(num_sql: str, den_sql: str, k: int) -> str:
    """DuckDB oracle twin of :func:`half_up_scaled_spark_sql`:
    ``(num*2*10^k + den) // (2*den)`` CAST to BIGINT (the HUGEINT
    intermediate would otherwise reach pandas as float64)."""
    scale = 10**k
    return (
        f"CAST(((CAST({num_sql} AS HUGEINT) * {2 * scale} + ({den_sql}))"
        f" // (2 * ({den_sql}))) AS BIGINT)"
    )
