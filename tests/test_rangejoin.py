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
