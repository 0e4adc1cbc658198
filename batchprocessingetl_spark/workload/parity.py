"""Cross-engine numeric parity helpers.

Floating-point SUM/AVG results depend on summation order, which differs
between Spark (partial aggregation over partitions) and any oracle
engine — at a rounding boundary the difference flips the last printed
digit. The fix is exact accumulation: cast each double summand to a
fixed-scale DECIMAL (exact per-value, identical in both engines), sum
decimals (associative, order-independent), then cast the total back to
double and round for display.

This is not just an oracle trick: order-independent aggregates are what
make results reproducible run-to-run on a real cluster, where partition
order is nondeterministic. Integral-valued doubles (quantities, counts)
sum exactly in binary and don't need it.

Spark helpers here; oracle SQL uses the matching
``ROUND(CAST(SUM(CAST(x AS DECIMAL(a,s))) AS DOUBLE), r)`` form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ACC = "decimal(28,6)"  # exact accumulator: 22 integer digits, 6 frac


def dsum(col: Column, round_to: int = 2) -> Column:
    """Order-independent SUM of a double column, rounded for display.

    Rounding happens in the DECIMAL domain (exact, half-up in both
    engines) — rounding after a cast to double would reintroduce
    tie-breaking drift, since exact sums like x.135 are not binary-
    representable."""
    return F.round(F.sum(col.cast(ACC)), round_to).cast("double")


def davg(col: Column, round_to: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count."""
    return F.round(
        F.sum(col.cast(ACC)).cast("double") / F.count(col),
        round_to,
    )


def year_equals(col: Column, year: int) -> Column:
    """``year(col) == year`` as a sargable timestamp-range predicate.

    ``year()`` over a column is a derived expression, so Catalyst
    cannot push it into the parquet scan (the r14 q03 plan showed
    PushedFilters without it — guide §6: filters on derived columns do
    not push down). The equivalent half-open range on the raw column
    lands in PushedFilters and enables row-group min/max skipping; in
    a UTC-pinned session the two predicates are identical for every
    non-null timestamp (and both reject NULL)."""
    lo = F.lit(f"{year}-01-01 00:00:00").cast("timestamp")
    hi = F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp")
    return (col >= lo) & (col < hi)


def dsum_sql(expr: str, round_to: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,6))), {round_to}) AS DOUBLE)"


def davg_sql(expr: str, round_to: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}), {round_to})"
    )
