"""Keyed snapshot diff — the data-ops companion to the SCD merges.

Compares two versions of a table by primary key and classifies every
key as added / removed / changed / unchanged, with null-safe value
comparison (the same IS DISTINCT FROM discipline as operators/scd2.py
change detection). The standard tool for validating a migration,
auditing a backfill, or reviewing what an upstream re-delivery
actually changed before publishing.

Plan: ONE full outer join on the key — both sides shuffle once on the
primary key (bucketed tables join shuffle-free), and the classification
is a pure projection. Output size is |keys(old) ∪ keys(new)|; filter
``diff_kind != 'unchanged'`` early for the usual sparse-diff case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    primary_key: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify keys across two snapshots.

    Returns one row per key in either side: (*primary_key, diff_kind)
    plus, for each compared column c, ``c_old`` and ``c_new``.
    ``diff_kind`` in {'added', 'removed', 'changed', 'unchanged'};
    value comparison is null-safe per column."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in primary_key]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from a side: {missing}")
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in primary_key],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in primary_key],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in primary_key:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    any_changed: Column = F.lit(False)
    for c in compare_cols:
        any_changed = any_changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    kind = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
            for k in primary_key
        ],
        kind.alias("diff_kind"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )
