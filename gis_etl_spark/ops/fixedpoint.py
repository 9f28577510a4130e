"""Cross-engine-deterministic rounded aggregates via explicit fixed-point.

Why this exists (round-1 CORRECTNESS failure class): `round(sum(double), 2)`
is nondeterministic across engines — and across runs of the SAME engine —
because float summation order varies with partitioning. Worse, TPC-H-ish
amounts like `l_extendedprice * (1 - l_discount)` are exact 4-decimal
rationals, so group sums land EXACTLY on half-cent boundaries with ~1/10
probability per group; two summation orders then round the same group to
different cents (q9_profit_by_nation_year failed 2/175 groups this way).

The obvious fix — cast to DECIMAL before summing — is itself engine-
dependent: Spark's `cast(double AS DECIMAL(18,4))` rounds the exact binary
expansion of the double (java.math.BigDecimal(double)), while DuckDB rounds
the shortest decimal representation; they disagree on values like
0.17124999999999999 (probed: 835/35k adversarial mismatches).

What IS bit-identical across engines is plain IEEE-754 double arithmetic
(*, +, /) and `floor`. So we quantize explicitly:

    q      = floor(v * 10^nd + 0.5)          -- exact int, per row
    S      = sum(q)                           -- integer sum: exact,
                                              -- associative, order-free
    result = floor(S / 10^(nd-out) + 0.5) / 10^out   -- deterministic
                                                     -- half-up at `out` dp

Every step is exactly specified by IEEE-754 given identical input bits, so
Spark and DuckDB (and any engine doing vectorized double math without FMA
contraction across SQL operators) produce identical bits. Probed bit-exact
on 40k adversarial values including exact-half and shortest-repr-boundary
cases (grouped sums, window sums, avg, ratios).

Scale note (100 TB): per-row q ≤ ~1e9 for money-like columns, so int64
sums overflow only past ~9e9 rows PER GROUP at nd=4; for global ungrouped
sums at extreme scale, sum `q.cast("decimal(38,0)")` instead — same
determinism (decimal sums are exact), one line to swap. Helpers here keep
the int64 fast path.

Per-row `round(x, k)` of STORED doubles or of small-integer ratios does
NOT need this treatment: both engines see identical input bits, and for
ratios p/q with q ≤ ~20000 the value can only sit exactly ON a half
boundary (both engines round half-up/away identically) or ≥ 1/(q·10^k)
away from it — never in the ambiguous near-half band.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fxq(col: Column | str, nd: int = 4) -> Column:
    """Quantize a double to an exact integer count of 10^-nd units.

    floor(v * 10^nd + 0.5): round-half-toward-+inf, pure IEEE arithmetic,
    bit-identical in Spark and DuckDB. Spark's floor(double) yields LONG.
    """
    return F.floor(_c(col) * F.lit(float(10**nd)) + F.lit(0.5))


def fxsum(col: Column | str, nd: int = 4, out: int = 2) -> Column:
    """Order-insensitive sum of doubles, rounded to `out` decimals.

    Quantizes each addend at nd decimals (exact int64), sums exactly,
    then applies one deterministic half-up rounding to `out` decimals.
    Returns DOUBLE. Replaces the flaky `round(sum(col), out)`.
    """
    s = F.sum(fxq(col, nd)).cast("double")
    if out == nd:
        return s / F.lit(float(10**nd))
    return F.floor(s / F.lit(float(10 ** (nd - out))) + F.lit(0.5)) / F.lit(
        float(10**out)
    )


def fxsum_over(col: Column | str, window, nd: int = 4, out: int = 2) -> Column:
    """Window variant of fxsum (running/cumulative sums)."""
    s = F.sum(fxq(col, nd)).over(window).cast("double")
    if out == nd:
        return s / F.lit(float(10**nd))
    return F.floor(s / F.lit(float(10 ** (nd - out))) + F.lit(0.5)) / F.lit(
        float(10**out)
    )


def fxavg(col: Column | str, nd: int = 4, out: int = 4) -> Column:
    """Order-insensitive mean of doubles, rounded to `out` decimals.

    avg = S/n computed as one double division of exact integers (S in
    10^-nd units), then one deterministic half-up rounding. The division
    and rounding sequence must match fxavg_sql token-for-token — IEEE
    guarantees bit equality only for the SAME operation sequence.
    """
    s = F.sum(fxq(col, nd)).cast("double")
    n = F.count(F.lit(1))
    avg_units = s / n  # avg in 10^-nd units, one rounding
    if out == nd:
        return F.floor(avg_units + F.lit(0.5)) / F.lit(float(10**nd))
    return F.floor(avg_units / F.lit(float(10 ** (nd - out))) + F.lit(0.5)) / F.lit(
        float(10**out)
    )


def fxratio(num: Column, den: Column, out: int = 6, nd: int = 4) -> Column:
    """Deterministic sum(num)/sum(den) ratio rounded to `out` decimals
    (TPC-H Q8 market-share shape)."""
    sn = F.sum(fxq(num, nd)).cast("double")
    sd = F.sum(fxq(den, nd)).cast("double")
    return F.floor(sn / sd * F.lit(float(10**out)) + F.lit(0.5)) / F.lit(
        float(10**out)
    )


# --- ANSI-SQL twins (DuckDB oracle side) -----------------------------------
# Token-for-token the same arithmetic as the Column builders above.


def fxq_sql(expr: str, nd: int = 4) -> str:
    return f"CAST(floor(({expr}) * 1e{nd} + 0.5) AS BIGINT)"


def fxsum_sql(expr: str, nd: int = 4, out: int = 2) -> str:
    s = f"CAST(sum({fxq_sql(expr, nd)}) AS DOUBLE)"
    if out == nd:
        return f"({s} / 1e{nd})"
    return f"(floor({s} / 1e{nd - out} + 0.5) / 1e{out})"


def fxsum_over_sql(expr: str, over: str, nd: int = 4, out: int = 2) -> str:
    s = f"CAST(sum({fxq_sql(expr, nd)}) OVER {over} AS DOUBLE)"
    if out == nd:
        return f"({s} / 1e{nd})"
    return f"(floor({s} / 1e{nd - out} + 0.5) / 1e{out})"


def fxavg_sql(expr: str, nd: int = 4, out: int = 4, count: str = "count(*)") -> str:
    s = f"CAST(sum({fxq_sql(expr, nd)}) AS DOUBLE)"
    avg_units = f"{s} / {count}"
    if out == nd:
        return f"(floor({avg_units} + 0.5) / 1e{nd})"
    return f"(floor({avg_units} / 1e{nd - out} + 0.5) / 1e{out})"


def fxratio_sql(num: str, den: str, out: int = 6, nd: int = 4) -> str:
    sn = f"CAST(sum({fxq_sql(num, nd)}) AS DOUBLE)"
    sd = f"CAST(sum({fxq_sql(den, nd)}) AS DOUBLE)"
    return f"(floor({sn} / {sd} * 1e{out} + 0.5) / 1e{out})"
