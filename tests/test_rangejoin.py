"""interval_join_bucketed: semantics (inclusive bounds, multi-bucket
spans, no duplicate matches) and plan posture (equi-join, never a
cartesian/broadcast-nested-loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.operators.rangejoin import interval_join_bucketed


def _join(spark, probes, intervals, width=10):
    p = spark.createDataFrame(probes, "p_id int, t long")
    iv = spark.createDataFrame(intervals, "iv_id int, lo long, hi long")
    return interval_join_bucketed(p, iv, "t", "lo", "hi", width)


def test_inclusive_bounds_and_multi_bucket_span(spark):
    # interval 5..25 spans buckets 0,1,2 at width 10; probes at the
    # exact bounds match, just outside do not, and a probe inside a
    # bucket the interval merely touches still matches exactly once
    out = _join(
        spark,
        [(1, 4), (2, 5), (3, 17), (4, 25), (5, 26)],
        [(100, 5, 25)],
    )
    got = sorted(r["p_id"] for r in out.collect())
    assert got == [2, 3, 4]


def test_each_pair_appears_exactly_once(spark):
    # wide interval overlapping many buckets must not duplicate matches
    out = _join(spark, [(1, 50)], [(100, 0, 1000)], width=7)
    assert out.count() == 1


def test_overlapping_intervals_all_match(spark):
    out = _join(spark, [(1, 50)], [(100, 0, 60), (101, 49, 51), (102, 51, 99)])
    assert sorted(r["iv_id"] for r in out.collect()) == [100, 101]


def test_rejects_overlapping_column_names(spark):
    p = spark.createDataFrame([(1, 2)], "a int, t long")
    iv = spark.createDataFrame([(1, 2, 3)], "a int, lo long, hi long")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join_bucketed(p, iv, "t", "lo", "hi", 10)


def test_plan_is_equi_join_not_nested_loop(spark):
    # big-big posture: the bucket key must make this a hash/sort-merge
    # equi-join; a theta-only range predicate would fall back to
    # BroadcastNestedLoopJoin or CartesianProduct
    p = spark.range(0, 10_000).select(
        F.col("id").alias("p_id"), (F.col("id") * 13 % 100_000).alias("t")
    )
    iv = spark.range(0, 2_000).select(
        F.col("id").alias("iv_id"),
        (F.col("id") * 50).alias("lo"),
        (F.col("id") * 50 + 75).alias("hi"),
    )
    out = interval_join_bucketed(p, iv, "t", "lo", "hi", 64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    # exact containment must be evaluated inside the join, not lost
    assert out.filter(~(F.col("t").between(F.col("lo"), F.col("hi")))).count() == 0


def test_negative_epochs_bucket_with_true_floor(spark):
    # pre-1970-style negative values: truncate-toward-zero would put
    # probe t=-5 in bucket 0 but interval lo=-8 in bucket 0 as well
    # while the real floor buckets are -1 — either way the MATCH SET
    # must equal the plain BETWEEN semantics
    probes = [(1, -25), (2, -10), (3, -1), (4, 0), (5, 3)]
    intervals = [(100, -28, -9), (101, -2, 4)]
    out = _join(spark, probes, intervals)
    got = sorted((r["p_id"], r["iv_id"]) for r in out.collect())
    expected = sorted(
        (p, i)
        for p, t in probes
        for i, lo, hi in intervals
        if lo <= t <= hi
    )
    assert got == expected


def test_straddling_zero_interval_matches_all_inside(spark):
    out = _join(spark, [(1, -15), (2, 0), (3, 15)], [(100, -20, 20)])
    assert sorted(r["p_id"] for r in out.collect()) == [1, 2, 3]


def test_oversized_interval_fails_loudly(spark):
    # one pathological interval 1000x the median span: must raise a
    # clear error at execution, not OOM or silently skew the shuffle
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    p = spark.createDataFrame([(1, 50)], "p_id int, t long")
    iv = spark.createDataFrame(
        [(100, 0, 90), (101, 0, 1_000_000)], "iv_id int, lo long, hi long"
    )
    out = interval_join_bucketed(p, iv, "t", "lo", "hi", 10, max_fanout=100)
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)) as ei:
        out.collect()
    assert "max_fanout" in str(ei.value)


def test_max_fanout_override_allows_long_intervals(spark):
    # default max_fanout (4096) would reject 100k buckets; explicit
    # override admits it and still matches exactly once
    p = spark.createDataFrame([(1, 50)], "p_id int, t long")
    iv = spark.createDataFrame([(100, 0, 1_000_000)], "iv_id int, lo long, hi long")
    wide = interval_join_bucketed(p, iv, "t", "lo", "hi", 10, max_fanout=200_000)
    assert wide.count() == 1
