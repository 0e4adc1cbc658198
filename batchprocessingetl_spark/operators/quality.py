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
