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
a repartition of the raw table. A mis-scaled ``bucket_width`` (e.g.
seconds where the data is micros) would silently explode one interval
into millions of rows — the ``max_fanout`` guard turns that into a
loud executor-side error instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ceiling on buckets generated per interval. An interval spanning more
# than this many buckets almost always means bucket_width is on the
# wrong scale; failing loudly beats skewing the shuffle. Overridable
# per call for genuinely long-lived intervals.
DEFAULT_MAX_FANOUT = 4096


def _floor_div(col: str, w: int) -> Column:
    """Exact integer floor(col / w), correct for NEGATIVE operands too.

    ``div`` alone truncates toward zero, which disagrees with floor on
    negatives (e.g. pre-1970 epochs) and would put a probe and its
    containing interval into different buckets, silently dropping the
    match. ``x - pmod(x, w)`` is the largest multiple of w that is
    <= x (pmod is always non-negative), so the subsequent ``div`` is
    exact — no double-precision round-trip for large epoch values.
    """
    return F.expr(f"(cast({col} as bigint) - pmod(cast({col} as bigint), {w})) div {w}")


def interval_join_bucketed(
    probe: DataFrame,
    intervals: DataFrame,
    probe_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    max_fanout: int = DEFAULT_MAX_FANOUT,
) -> DataFrame:
    """Inner-join ``probe`` rows to every interval containing them
    (``lo <= probe_col <= hi``, inclusive) via fixed-width bucketing.

    All three bound columns must be integers on a shared scale (e.g.
    ``unix_micros`` epochs); negative values (pre-1970 epochs) bucket
    correctly via true floor division. Column names of the two inputs
    must be disjoint; the output carries all probe columns followed by
    all interval columns.

    Any single interval wider than ``max_fanout * bucket_width``
    raises at execution time (executor-side ``raise_error``) rather
    than silently generating an oversized explode — a span that large
    nearly always means ``bucket_width`` is on the wrong time scale.
    Raise ``max_fanout`` explicitly for legitimately long intervals.
    """
    overlap = set(probe.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"probe/interval column names must be disjoint: {overlap}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    if int(max_fanout) <= 0:
        raise ValueError("max_fanout must be positive")
    p = probe.withColumn("__pb", _floor_div(probe_col, w))
    lob, hib = _floor_div(lo_col, w), _floor_div(hi_col, w)
    fanout = hib - lob + 1
    hib_guarded = (
        F.when(
            fanout > F.lit(int(max_fanout)),
            F.raise_error(
                F.format_string(
                    "interval_join_bucketed: interval [%s, %s] spans %s buckets "
                    + f"at bucket_width={w} (max_fanout={int(max_fanout)}); "
                    + "bucket_width is likely on the wrong scale — widen it or "
                    + "pass a larger max_fanout",
                    F.col(lo_col).cast("string"),
                    F.col(hi_col).cast("string"),
                    fanout.cast("string"),
                )
            ).cast("bigint"),
        )
        .otherwise(hib)
    )
    iv = intervals.withColumn("__ib", F.explode(F.sequence(lob, hib_guarded)))
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
