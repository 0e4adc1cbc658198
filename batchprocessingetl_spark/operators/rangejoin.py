"""Big-big interval (range-containment) join without a broadcast.

Spark has no native range-join strategy: ``probe JOIN intervals ON ts
BETWEEN lo AND hi`` with no equi-key plans as BroadcastNestedLoopJoin
(fine only while one side broadcasts) or a cartesian product (never
fine). ``range_join_broadcast`` (operators/asof.py) covers the
small-intervals case; this is the big-big path — both sides shuffle on
a derived fixed-width bucket key, turning the theta join into an
equi-join. The same binning underlies DuckDB's IEJoin fallbacks and
Databricks' RANGE_JOIN hint, re-expressed here in plain DataFrame ops.

Plan shape: an interval [lo, hi] overlaps buckets floor(lo/w) ..
floor(hi/w) and explodes into one row per overlapped bucket; a probe
row belongs to exactly ONE bucket floor(ts/w), so every matching
(probe, interval) pair meets in exactly one bucket — no post-join
dedup pass. Shuffle volume is |probe| + sum(span_i/w) rows; the exact
containment predicate runs post-match inside the join, so false bucket
neighbors are dropped before anything else sees them.

Scale notes (100 TB): pick ``bucket_width`` near the median interval
span — too small multiplies the interval explode, too large puts many
non-overlapping pairs into each bucket for the post-filter to discard.
A hot bucket (rush-hour data) is ordinary equi-join skew: AQE
skew-join splitting handles it, same as any skewed key. Both inputs
keep map-side column pruning since bucketing is a derived column, not
a repartition of the raw table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    probe: DataFrame,
    intervals: DataFrame,
    probe_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``probe`` rows to every interval containing them
    (``lo <= probe_col <= hi``, inclusive) via fixed-width bucketing.

    All three bound columns must be NON-NEGATIVE integers on a shared
    scale (e.g. ``unix_micros`` epochs) — ``div`` truncates toward
    zero, which equals floor only for non-negative operands. Column
    names of the two inputs must be disjoint; the output carries all
    probe columns followed by all interval columns.
    """
    overlap = set(probe.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"probe/interval column names must be disjoint: {overlap}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    p = probe.withColumn("__pb", F.expr(f"cast({probe_col} as bigint) div {w}"))
    iv = intervals.withColumn(
        "__ib",
        F.explode(
            F.sequence(
                F.expr(f"cast({lo_col} as bigint) div {w}"),
                F.expr(f"cast({hi_col} as bigint) div {w}"),
            )
        ),
    )
    return (
        p.join(
            iv,
            (F.col("__pb") == F.col("__ib"))
            & (F.col(probe_col) >= F.col(lo_col))
            & (F.col(probe_col) <= F.col(hi_col)),
            "inner",
        )
        .drop("__pb", "__ib")
    )
