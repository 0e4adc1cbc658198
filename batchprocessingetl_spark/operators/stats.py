"""Grouped statistical model fitting from sufficient statistics.

``group_ols`` fits a per-group simple linear regression (y = a + b*x)
the scale-correct way: ONE hash aggregate collecting the five
sufficient sums (n, Sx, Sy, Sxx, Sxy [, Syy]) with map-side combine,
then closed-form slope/intercept/r2 arithmetic on the tiny grouped
result. No per-group iteration, no MLlib fit loop, no second scan —
this is how regression-at-100-TB should decompose: the heavy pass is
a plain aggregation Catalyst already knows how to distribute.

Cross-engine determinism (the same discipline as workload/parity.py):
float SUMs are partition-order-dependent, so the x column must be an
integer expression and y is accumulated as a fixed-scale DECIMAL —
both sums are then exact and order-independent. The closed-form
arithmetic happens AFTER casting the exact sums to double, as a fixed
sequence of IEEE operations that any engine reproduces bit-for-bit.

Built-in ``regr_slope``/``regr_intercept`` exist in both Spark and
DuckDB but accumulate in floating point with engine-specific
streaming updates — fine for exploration, not reproducible enough to
hash-compare (or to rerun on a cluster where partition order shifts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact accumulators: x is integer-valued by contract; y gets a fixed
# 2-dp-friendly scale that keeps y*y within decimal(38) in BOTH engines
Y_ACC = "decimal(12,2)"


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-group OLS of y on x. ``x`` must be integer-valued (cast
    enforced) with |x| < 1e18; ``y`` is accumulated as DECIMAL(12,2) —
    exact for currency-style inputs. Every x sum accumulates in
    DECIMAL(18,0) (not long) so an out-of-range regressor — e.g.
    epoch-millisecond x values whose squares exceed the 64-bit range —
    never silently wraps a long sum: Spark (non-ANSI) overflows to a
    VISIBLE NULL, while DuckDB (and Spark under ANSI mode) raises a
    hard out-of-range error — either way the corruption is loud, but
    the two engines fail DIFFERENTLY, so keep |x| within ~1e9 (x^2
    within DECIMAL(18)) when a query is oracle-compared. Returns
    group_cols + (n, slope, intercept,
    r2), with NULLs where x has no variance (or n < 2)."""
    xi = x.cast("long").cast("decimal(18,0)")
    yd = y.cast(Y_ACC)
    sums = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(yd).alias("sy"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xi * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy  # n^2 * cov
    varx_n = n * sxx - sx * sx  # n^2 * var(x)
    vary_n = n * syy - sy * sy
    slope = cov_n / varx_n
    return sums.select(
        *group_cols,
        "n",
        F.when(varx_n > 0, F.round(slope, round_to)).alias("slope"),
        F.when(varx_n > 0, F.round((sy - slope * sx) / n, round_to)).alias(
            "intercept"
        ),
        F.when(
            (varx_n > 0) & (vary_n > 0),
            F.round((cov_n * cov_n) / (varx_n * vary_n), round_to),
        ).alias("r2"),
    )


def group_ols_sql_duckdb(
    table_expr: str,
    group_cols: list[str],
    x_sql: str,
    y_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`group_ols` — the identical sums and the
    identical post-cast double arithmetic, so results hash-match."""
    g = ", ".join(group_cols)
    return f"""
        WITH sums AS (
            SELECT {g},
                   COUNT(*) AS n,
                   SUM(CAST({x_sql} AS DECIMAL(18,0))) AS sx,
                   SUM(CAST({x_sql} AS DECIMAL(18,0))
                       * CAST({x_sql} AS DECIMAL(18,0))) AS sxx,
                   SUM(CAST({y_sql} AS DECIMAL(12,2))) AS sy,
                   SUM(CAST({y_sql} AS DECIMAL(12,2))
                       * CAST({y_sql} AS DECIMAL(12,2))) AS syy,
                   SUM(CAST({x_sql} AS DECIMAL(18,0))
                       * CAST({y_sql} AS DECIMAL(12,2))) AS sxy
            FROM {table_expr}
            GROUP BY {g}
        ), d AS (
            SELECT {g}, n,
                   CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                   CAST(sxx AS DOUBLE) AS sxxd, CAST(sy AS DOUBLE) AS syd,
                   CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
            FROM sums
        )
        SELECT {g}, n,
               CASE WHEN nd * sxxd - sxd * sxd > 0 THEN
                   ROUND((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd),
                         {round_to}) END AS slope,
               CASE WHEN nd * sxxd - sxd * sxd > 0 THEN
                   ROUND((syd - (nd * sxyd - sxd * syd)
                                / (nd * sxxd - sxd * sxd) * sxd) / nd,
                         {round_to}) END AS intercept,
               CASE WHEN nd * sxxd - sxd * sxd > 0
                     AND nd * syyd - syd * syd > 0 THEN
                   ROUND((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
                         / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)),
                         {round_to}) END AS r2
        FROM d
    """


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    n_bins: int,
    round_to: int = 2,
) -> DataFrame:
    """Equi-depth (quantile) histogram — the feature-binning /
    data-profiling primitive: exact interpolated percentile cutpoints
    at k/n_bins (one sort-based aggregate, the same exact-percentile
    machinery q44 pins cross-engine), broadcast back as a 1-row frame,
    bin assignment as a narrow ``aggregate`` fold over the cutpoint
    array (bin = #cutpoints strictly below the value), then a
    fixed-width rollup. NO global window: a naive ntile() needs a
    single-partition global sort, which is exactly what dies at 100 TB
    — here the heavy input is touched by one percentile aggregate and
    one codegen projection, both distributed.

    Returns (bin, n_rows, min_v, max_v) for non-empty bins, bin in
    [0, n_bins-1]. Null values are dropped (no bin)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    v = F.col(col).cast("double")
    fracs = [k / n_bins for k in range(1, n_bins)]
    cuts = df.filter(v.isNotNull()).agg(
        F.percentile(v, F.array(*[F.lit(f) for f in fracs])).alias("__cuts")
    )
    binned = (
        df.filter(v.isNotNull())
        .join(F.broadcast(cuts))
        .select(
            v.alias("__v"),
            F.aggregate(
                "__cuts",
                F.lit(0),
                lambda acc, c: acc + F.when(F.col("__v") > c, 1).otherwise(0),
            ).alias("bin"),
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("__v"), round_to).alias("min_v"),
            F.round(F.max("__v"), round_to).alias("max_v"),
        )
        .orderBy("bin")
    )


def quantile_gate(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    q: float,
) -> DataFrame:
    """Per-group quantile gate — keep rows with ``col`` >= their
    group's q-th exact interpolated percentile ("top-X% per source",
    the standard corpus-curation allocation rule). One grouped
    percentile aggregate (one row per group) joined back on the group
    key, then a narrow filter — no percent_rank window, whose
    per-group sort + full materialization is the thing to avoid when
    groups are huge. The cutoff table scales with GROUP-KEY
    CARDINALITY, not input size, so the join side is left unhinted:
    AQE broadcasts it when it's small and falls back to shuffle when a
    high-cardinality key would OOM a forced broadcast. Adds the cutoff
    as ``__cut`` for auditability; callers drop it if unwanted."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0,1), got {q}")
    v = F.col(col).cast("double")
    cuts = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(q)).alias("__cut")
    )
    return df.join(cuts, group_cols).filter(v >= F.col("__cut"))


BOOT_B = 32  # resamples; explode factor of the bootstrap pass


def bootstrap_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    id_col: str,
    n_resamples: int = BOOT_B,
    seed: str = "boot",
    z: float = 1.96,
) -> DataFrame:
    """Per-group mean with a subsample-bootstrap confidence interval —
    uncertainty quantification as a PLAN, with replayable resamples.

    Each of ``n_resamples`` half-samples keeps a row iff its
    md5(seed:b:id) uniform < 0.5 (the m-out-of-n bootstrap, m = n/2);
    the spread of the resample means estimates the sampling error,
    scaled by sqrt(m/n) = 1/sqrt(2) back to the full-sample scale.
    Deterministic draws make the CI reproducible run-to-run and
    oracle-replicable — an RNG bootstrap cannot be differentially
    tested at all.

    Shape: one explode (factor B) -> one hash aggregate on
    (group, b) with exact decimal sums -> one tiny aggregate of B
    means per group. No window, no driver loop; the heavy pass is
    B x |input| narrow rows with map-side combine.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + ":"),
                        F.col("__b").cast("string"),
                        F.lit(":"),
                        F.col("__id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**15))
    )
    acc = "decimal(28,6)"
    resampled = (
        df.select(
            *group_cols,
            value.cast(acc).alias("__v"),
            F.col(id_col).alias("__id"),
            F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("__b"),
        )
        .filter(u < 0.5)
        .groupBy(*group_cols, "__b")
        .agg((F.sum("__v").cast("double") / F.count(F.lit(1))).alias("__mean_b"))
    )
    full = df.groupBy(*group_cols).agg(
        (F.sum(value.cast(acc)).cast("double") / F.count(F.lit(1))).alias("mean")
    )
    half_sd = F.stddev_samp("__mean_b")
    spread = resampled.groupBy(*group_cols).agg(
        (half_sd / F.lit(2.0 ** 0.5)).alias("__se"),
        F.count(F.lit(1)).alias("n_resamples"),
    )
    return full.join(spread, group_cols).select(
        *group_cols,
        F.round("mean", 6).alias("mean"),
        F.round(F.col("mean") - F.lit(z) * F.col("__se"), 6).alias("ci_lo"),
        F.round(F.col("mean") + F.lit(z) * F.col("__se"), 6).alias("ci_hi"),
        "n_resamples",
    )
