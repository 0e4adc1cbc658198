"""Declarative data-quality constraint checking (Deequ-style).

The reference's staging layer hard-codes its cleaning rules
(null filters, casts — staging_layer.py:55-84); this generalizes the
idea to a declarative rule set evaluated in ONE aggregate pass over
the table, producing a violation report a pipeline can gate on before
publishing a layer.

Every rule compiles to a conditional-count aggregate expression
(not_null / range / accepted values) or a count-minus-countDistinct
(uniqueness), all in the same ``agg`` — one scan, map-side partial
aggregation, a 1-row result exploded into the per-rule report. No
second pass, no Python, no driver-side row inspection; cost is a
single linear scan at any table size.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    ranges: Mapping[str, tuple[float, float]] | None = None,
    accepted: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Evaluate all rules in one aggregate pass.

    Returns one row per rule: (rule, target, n_violations, passed) —
    ``rule`` in {'not_null', 'unique', 'range', 'accepted'}, ``target``
    the column (or comma-joined key), ``n_violations`` the offending
    row count, ``passed`` = n_violations == 0. ``unique`` counts rows
    in excess of DISTINCT NON-NULL keys — a null-key row violates
    uniqueness (a primary key implies NOT NULL), matching
    ``countDistinct``'s null handling. ``range``/``accepted`` skip
    nulls (pair them with a ``not_null`` rule to forbid them)."""
    ranges = dict(ranges or {})
    accepted = dict(accepted or {})
    aggs = []
    labels: list[tuple[str, str]] = []
    for c in not_null:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__a{len(labels)}"))
        labels.append(("not_null", c))
    for key in unique:
        key = list(key)
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(*[F.col(k) for k in key])).alias(
                f"__a{len(labels)}"
            )
        )
        labels.append(("unique", ",".join(key)))
    for c, (lo, hi) in ranges.items():
        cond = F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi))
        aggs.append(F.count_if(cond).alias(f"__a{len(labels)}"))
        labels.append(("range", c))
    for c, vals in accepted.items():
        cond = F.col(c).isNotNull() & ~F.col(c).isin(*list(vals))
        aggs.append(F.count_if(cond).alias(f"__a{len(labels)}"))
        labels.append(("accepted", c))
    if not aggs:
        raise ValueError("no rules given")
    one = df.agg(*aggs)
    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        F.lit(target).alias("target"),
                        F.col(f"__a{i}").cast("long").alias("n_violations"),
                    )
                    for i, (rule, target) in enumerate(labels)
                ]
            )
        ).alias("r")
    )
    return report.select(
        "r.rule", "r.target", "r.n_violations", (F.col("r.n_violations") == 0).alias("passed")
    )


def profile_columns(
    df: DataFrame,
    numeric_cols: tuple[str, ...] = (),
    string_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Single-pass column profiler (Deequ-analyzer-style): one row per
    profiled column with (kind, n_rows, n_nulls, n_distinct, min_v,
    max_v, avg_v). String columns profile the LENGTH distribution
    (min/max/avg chars) plus exact distinct count of the value itself —
    length stats are integers, so every number here is exact and
    engine-independent (averages accumulate in fixed-scale decimal per
    workload/parity.py).

    ALL metrics for ALL columns come from ONE aggregate over ONE scan —
    the profiler never rescans per column. The multiple exact
    count(DISTINCT) specs lower to a single Expand + two-phase
    aggregate (rows multiply by the number of distinct specs map-side,
    which is the documented price of exactness; swap in
    approx_count_distinct when profiling very wide tables at full
    scale). No joins, no windows, no driver loop.
    """
    from batchprocessingetl_spark.workload.parity import davg

    if not numeric_cols and not string_cols:
        raise ValueError("nothing to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(F.when(v.isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(v).alias(f"{c}__dist"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
            davg(v, 6).alias(f"{c}__avg"),
        ]
    for c in string_cols:
        v = F.col(c)
        ln = F.length(v).cast("double")
        aggs += [
            F.count(F.when(v.isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(v).alias(f"{c}__dist"),
            F.min(ln).alias(f"{c}__min"),
            F.max(ln).alias(f"{c}__max"),
            davg(ln, 6).alias(f"{c}__avg"),
        ]
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(kind).alias("kind"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__dist").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            F.col(f"{c}__avg").alias("avg_v"),
        )
        for c, kind in [(c, "numeric") for c in numeric_cols]
        + [(c, "string") for c in string_cols]
    ]
    return wide.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
