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

Plan shape / scale (r14 rework, guide §2.4 — remove shuffles
outright): ONE full-outer join (new x current-existing) on the primary
key classifies every key, and a per-row CASE emits the 0-2 output rows
(expired / untouched / insert) as an exploded struct array — so the
dimension is shuffled ONCE. The previous shape (left join for change
detection + a left-semi AND a left-anti of ``current`` against the
changed keys) shuffled the current dimension three times and, because
the changed-keys subtree fed three consumers, re-ran the change-
detection join per consumer (the measured q41 plan scanned the
dimension 22 times). With a bucketed dimension table the single join
is shuffle-free. No driver-side collect; works at any dimension size.
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

    # presence marker for the batch side: update_columns may be
    # legitimately NULL, so a literal TRUE column is the only reliable
    # "this key was in the batch" indicator after the full-outer join
    new_a = new_data.withColumn("__in_batch", F.lit(True)).alias("new")
    cur_a = current.alias("existing")
    # USING-style join: the key columns coalesce into single output
    # attributes valid for both sides
    joined = new_a.join(cur_a, on=primary_key, how="full_outer")

    # no match in existing-current => brand-new key (start_date is never
    # NULL on a real dimension row, so it doubles as the match indicator)
    is_new_key = F.col("existing.start_date").isNull()
    in_batch = F.col("new.__in_batch").eqNullSafe(F.lit(True))

    payload = update_columns + list(SCD2_COLS)
    expired_row = F.struct(
        *[F.col(f"existing.{c}").alias(c) for c in update_columns],
        F.col("existing.start_date").alias("start_date"),
        ts.alias("end_date"),
        F.lit(False).alias("is_current"),
    )
    untouched_row = F.struct(
        *[F.col(f"existing.{c}").alias(c) for c in update_columns],
        *[F.col(f"existing.{c}").alias(c) for c in SCD2_COLS],
    )
    insert_row = F.struct(
        *[F.col(f"new.{c}").alias(c) for c in update_columns],
        ts.alias("start_date"),
        F.lit(None).cast("timestamp").alias("end_date"),
        F.lit(True).alias("is_current"),
    )
    out_rows = (
        F.when(~in_batch, F.array(untouched_row))  # key absent from batch
        .when(is_new_key, F.array(insert_row))  # brand-new key
        .when(
            _any_attr_differs(update_columns),  # changed: expire + insert
            F.array(expired_row, insert_row),
        )
        .otherwise(F.array(untouched_row))  # unchanged
    )
    merged = joined.select(
        *primary_key, F.explode(out_rows).alias("__r")
    ).select(*primary_key, *[F.col(f"__r.{c}").alias(c) for c in payload])

    return history.unionByName(merged.select(*history.columns))


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
