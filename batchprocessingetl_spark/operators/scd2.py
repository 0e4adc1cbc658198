"""SCD Type 2 dimension merge — corrected semantics.

The reference's ``apply_scd_type_2``
(``/root/reference/src/curated/curated_layer.py:47-78``) has four
documented deviations from intended SCD2 semantics (SURVEY.md §2.11
B1-B4): it expires the *unchanged* keys and drops prior versions of
changed keys (B1), silently loses brand-new keys because the null-unsafe
``!=`` change predicate filters them (B2), misses NULL<->value
transitions (B3), and accepts non-unique per-key input grain (B4).

This implementation computes the evident intent:

- change detection is null-safe (``eqNullSafe`` — SQL IS DISTINCT FROM);
- brand-new keys insert as current;
- changed keys get their old current row expired (end_date = batch_ts,
  is_current = false) AND a new current row;
- unchanged keys (and keys absent from the batch) pass through;
- the batch timestamp is injected (deterministic, testable) instead of
  ``current_timestamp()`` (reference F2 nondeterminism, SURVEY §2.8);
- input grain is resolved to one row per key via a deterministic
  tie-break before merging (B4).

Plan shape / scale: one left join (new x current-existing) on the
primary key for change detection, one left-semi/anti split of existing,
and a unionByName — all shuffles hash on the primary key, so AQE can
reuse the exchange; with a bucketed dimension table the joins are
shuffle-free. No driver-side collect; works at any dimension size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCD2_COLS = ("start_date", "end_date", "is_current")


def _any_attr_differs(update_columns: list[str]) -> Column:
    """Null-safe 'any attribute changed' predicate (IS DISTINCT FROM),
    the corrected form of the reference's null-unsafe OR-fold
    (curated_layer.py:55)."""
    preds = [
        ~F.col(f"new.{c}").eqNullSafe(F.col(f"existing.{c}")) for c in update_columns
    ]
    return reduce(lambda a, b: a | b, preds)


def resolve_grain(df: DataFrame, primary_key: list[str], order_by: list[Column]) -> DataFrame:
    """One row per key by deterministic preference order (fixes B4).
    Single shuffle on the key; at scale prefer feeding pre-deduplicated
    batches so this window is a no-op."""
    w = Window.partitionBy(*primary_key).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_scd2(
    new_data: DataFrame,
    existing_data: DataFrame | None,
    primary_key: list[str],
    update_columns: list[str],
    batch_ts: str,
) -> DataFrame:
    """Merge a new attribute snapshot into an SCD2 dimension.

    ``new_data``: one row per key (use :func:`resolve_grain` first if
    not), carrying ``primary_key + update_columns``.
    ``existing_data``: current dimension with SCD2 columns, or ``None``
    for the initial load (reference curated_layer.py:73-77).
    ``batch_ts``: ISO timestamp string stamped on expiries/inserts.
    """
    ts = F.lit(batch_ts).cast("timestamp")
    attr_cols = primary_key + update_columns

    if existing_data is None:
        return new_data.select(
            *attr_cols,
            ts.alias("start_date"),
            F.lit(None).cast("timestamp").alias("end_date"),
            F.lit(True).alias("is_current"),
        )

    current = existing_data.filter(F.col("is_current"))
    history = existing_data.filter(~F.col("is_current"))

    new_a = new_data.alias("new")
    cur_a = current.alias("existing")
    joined = new_a.join(cur_a, on=primary_key, how="left")

    # no match in existing-current => brand-new key (start_date is never
    # NULL on a real dimension row, so it doubles as the match indicator)
    is_new_key = F.col("existing.start_date").isNull()
    # changed = existing key whose attrs differ (null-safely), or brand-new key
    changes = joined.filter(is_new_key | _any_attr_differs(update_columns)).select(
        *[F.col(f"new.{c}").alias(c) for c in attr_cols]
    )
    changed_keys = changes.select(*primary_key)

    # expired: prior current rows of changed keys -> closed out
    expired = (
        current.join(changed_keys, on=primary_key, how="left_semi")
        .withColumn("end_date", ts)
        .withColumn("is_current", F.lit(False))
    )
    # unchanged current rows (incl. keys absent from this batch) pass through
    untouched = current.join(changed_keys, on=primary_key, how="left_anti")

    inserts = changes.select(
        *attr_cols,
        ts.alias("start_date"),
        F.lit(None).cast("timestamp").alias("end_date"),
        F.lit(True).alias("is_current"),
    )

    return (
        history.unionByName(untouched)
        .unionByName(expired)
        .unionByName(inserts)
    )


def apply_scd1(
    new_data: DataFrame,
    existing: DataFrame | None,
    primary_key: list[str],
) -> DataFrame:
    """SCD Type 1 merge — overwrite in place, no history: the merged
    snapshot carries the batch's row for every key the batch contains
    (changed or not — Type 1 has no change detection to get wrong) and
    the existing row for every key it doesn't. The no-history sibling
    of :func:`apply_scd2` for dimensions where only the latest value
    matters (contact fields, free-text labels).

    Plan: ONE left-anti join (existing minus batch keys) + unionByName —
    a single hash shuffle on the primary key; with both sides bucketed
    on the key it is shuffle-free. Initial load (existing=None) is the
    batch itself. Column sets must match; the anti join keys on the
    batch's key projection only, so wide dimensions never shuffle their
    payload twice."""
    if existing is None:
        return new_data
    if set(new_data.columns) != set(existing.columns):
        raise ValueError(
            f"column mismatch: batch {sorted(new_data.columns)} "
            f"vs existing {sorted(existing.columns)}"
        )
    carried = existing.join(new_data.select(*primary_key), primary_key, "left_anti")
    return new_data.unionByName(carried)


def as_of(dim: DataFrame, ts: str) -> DataFrame:
    """Time-travel read over an SCD2 dimension: the version row valid
    at timestamp ``ts`` — start_date <= ts < end_date, with the open
    (current) interval as end_date IS NULL. A pure narrow filter, so
    Catalyst pushes it into the dimension scan (partition/row-group
    pruning when the dim is laid out by start_date); keys born after
    ``ts`` simply yield no row. This is the consumer-side counterpart
    of ``apply_scd2``: dashboards replay any historical state without
    snapshots having been materialized per day."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col("start_date") <= t)
        & (F.col("end_date").isNull() | (F.col("end_date") > t))
    )
