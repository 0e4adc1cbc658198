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
    DP release. One shuffle (the count), then a narrow projection.

    The draw key is an INJECTIVE netstring-style encoding — NULL ->
    'N', value v -> 'V<len>:<v>' — so two distinct group tuples can
    never alias to one draw key (and thus share correlated noise),
    even when values contain the separator or look like the NULL
    sentinel. ``dp_key_sql_duckdb`` is the byte-identical twin."""
    key = F.concat_ws(
        "\x1f",
        *[_netstring(F.col(c).cast("string")) for c in group_cols],
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


def _netstring(v: Column) -> Column:
    """Injective component encoding: NULL -> 'N', value -> 'V<len>:<v>'.
    The length prefix makes the concatenation decodable left-to-right,
    so no value content (separators, sentinel look-alikes) can alias
    two distinct group tuples to the same draw key."""
    return F.when(v.isNull(), F.lit("N")).otherwise(
        F.concat(F.lit("V"), F.length(v).cast("string"), F.lit(":"), v)
    )


def dp_key_sql_duckdb(col_sqls: list[str]) -> str:
    """DuckDB twin of the injective netstring draw key: NULL -> 'N',
    value -> 'V<len>:<v>', components joined with chr(31)."""
    parts = [
        f"CASE WHEN {c} IS NULL THEN 'N' ELSE 'V' ||"
        f" length(CAST({c} AS VARCHAR)) || ':' || CAST({c} AS VARCHAR) END"
        for c in col_sqls
    ]
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
