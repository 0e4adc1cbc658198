"""As-of and range joins (beyond-reference operators, SURVEY.md §2.3
"absent join kinds"; both are staples of event/time-series analytics).

Spark has no native ASOF JOIN; the scalable formulation is the
union+window plan:

  tag left/right -> unionByName -> window per join key ordered by
  (ts, right-before-left) -> last_value(right attrs, ignorenulls) ->
  keep left rows.

One shuffle on the join key, no point-lookups, no per-group Python —
this beats the ``applyInPandas``+``pd.merge_asof`` fallback by keeping
everything in Tungsten, and unlike a broadcast backward-scan it works
when both sides are large. Semantics match DuckDB's
``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts`` (greatest right ts
<= left ts, inclusive), which the oracle uses.

Range join: the general big-big case should bucketize the range key and
equi-join on bucket; for a small band/dimension side (the common
calendar/band lookup), broadcasting the bands and letting Catalyst turn
the non-equi predicate into a BroadcastNestedLoopJoin is optimal —
O(rows x bands) with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts within the same ``by`` group.

    Output: all left columns + ``right_cols`` (renamed as given) +
    ``matched_ts`` (the right row's timestamp, NULL if no match).

    All right attributes are carried in ONE struct and forward-filled
    together, so the output always reflects a single right row — never
    a column-wise mix of different rows (filling each column
    independently would backfill a NULL attribute of the latest right
    row from an older one, diverging from ASOF semantics). Right rows
    tied on (by, ts) are broken deterministically by the struct's full
    column ordering (last = greatest struct wins).
    """
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("matched_ts"),
            *[F.col(c) for c in right_cols],
        ).alias("__rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal ts -> inclusive match;
    # __rrow in the ordering makes the pick among ts-tied right rows
    # deterministic (left rows carry NULL __rrow, sorted first so a
    # right row at the same ts still fills them)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rrow").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__rrow", F.last("__rrow", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col("__rrow.matched_ts").alias("matched_ts"),
            *[F.col(f"__rrow.{c}").alias(c) for c in right_cols],
        )
    )


def range_join_broadcast(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join each fact row to the band where lo <= value < hi. ``bands``
    must be small (broadcast); non-overlapping bands yield at most one
    match per row."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, "left")
