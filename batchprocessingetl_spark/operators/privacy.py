"""Differentially-private release primitives (Laplace mechanism).

Training-data and analytics pipelines increasingly publish aggregate
statistics (per-source counts, per-day activity) under a DP budget.
This module implements the epsilon-DP Laplace mechanism for count
queries (sensitivity 1) as a pure DataFrame plan: one exact hash
aggregate, then a narrow noise projection — no RNG service, no driver
loop, nothing that breaks at 100 TB.

Determinism: production DP wants fresh randomness, but a reproducible
pipeline (and a cross-engine differential test) wants the same noise
on re-run. The draw is therefore the repo's md5-uniform idiom — u =
md5(seed:groupkey) first-15-hex-digits / 16^15, a Uniform(0,1) both
engines derive identically — pushed through the Laplace inverse CDF:

    noise = -(1/eps) * sign(u - 1/2) * ln(1 - 2*|u - 1/2|)

Rotating ``seed`` per release is exactly "fresh randomness" while
keeping every individual release replayable for audit. The privacy
guarantee holds for any fixed seed choice made independently of the
data (the standard PRG-based DP deployment posture).

Null groups: the draw key NULL-coalesces every group value to a \\x01
sentinel BEFORE joining with the \\x1f separator — ``concat_ws`` alone
silently skips NULLs, which would give a NULL group the same draw as
an empty-string group (correlated noise across two released cells).
Oracle twins must apply the identical construction; see
:func:`dp_key_sql_duckdb`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX15 = float(16**15)  # 2^60 — md5-prefix uniform denominator


def _uniform(key: Column, seed: str) -> Column:
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), key))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(HEX15)


def laplace_noise(key: Column, epsilon: float, seed: str) -> Column:
    """Deterministic Laplace(0, 1/epsilon) draw keyed on ``key``."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    u = _uniform(key, seed) - F.lit(0.5)
    return (
        F.lit(-1.0 / epsilon)
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    seed: str = "dp",
    round_to: int = 6,
) -> DataFrame:
    """Epsilon-DP group counts: exact COUNT(*) per group (sensitivity
    1 under add/remove-one-row adjacency) plus Laplace(1/epsilon)
    noise keyed on the group value. Returns group_cols +
    (noisy_count,) ONLY — the exact count must not ride along in a
    DP release. One shuffle (the count), then a narrow projection."""
    key = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in group_cols],
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            *group_cols,
            F.round(
                F.col("__n") + laplace_noise(key, epsilon, seed), round_to
            ).alias("noisy_count"),
        )
    )


def dp_key_sql_duckdb(col_sqls: list[str]) -> str:
    """DuckDB twin of the null-safe draw key: COALESCE each value to
    the chr(1) sentinel, join with the chr(31) separator."""
    parts = [f"COALESCE(CAST({c} AS VARCHAR), chr(1))" for c in col_sqls]
    return " || chr(31) || ".join(parts)


def dp_noise_sql_duckdb(key_sql: str, epsilon: float, seed: str) -> str:
    """DuckDB twin of :func:`laplace_noise` for oracle queries.
    ``seed`` is embedded as a SQL literal — single quotes doubled."""
    seed_sql = seed.replace("'", "''")
    u = (
        f"(('0x' || substr(md5('{seed_sql}:' || {key_sql}), 1, 15))::BIGINT"
        f" / {HEX15!r} - 0.5)"
    )
    return f"(-1.0 / {epsilon!r}) * sign({u}) * ln(1.0 - 2.0 * abs({u}))"
