"""MERGE-style transactional upsert (operators/merge.py): semantics of
every when_matched/when_not_matched combination, the staged-swap crash
contract (a failed write OR a crash between the swap renames never
loses the live snapshot), and the source key-uniqueness guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.operators.merge import (
    merge_into,
    merge_plan,
    recover_merge_target,
)


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    return target, source


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_plan_all_clause_combinations(spark):
    target, source = _frames(spark)
    # update + insert (upsert): source wins for 2, 4 inserted
    assert _rows(merge_plan(target, source, ["k"])) == [
        (1, "a", 10.0), (2, "B", 200.0), (3, "c", 30.0), (4, "d", 40.0),
    ]
    # update only: no insert of 4
    assert _rows(merge_plan(target, source, ["k"], "update", None)) == [
        (1, "a", 10.0), (2, "B", 200.0), (3, "c", 30.0),
    ]
    # delete + insert: 2 dropped, 4 inserted
    assert _rows(merge_plan(target, source, ["k"], "delete", "insert")) == [
        (1, "a", 10.0), (3, "c", 30.0), (4, "d", 40.0),
    ]
    # delete only (anti-join semantics)
    assert _rows(merge_plan(target, source, ["k"], "delete", None)) == [
        (1, "a", 10.0), (3, "c", 30.0),
    ]
    # keep matched + insert (insert-if-absent)
    assert _rows(merge_plan(target, source, ["k"], None, "insert")) == [
        (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0),
    ]
    # no-op clauses = target unchanged
    assert _rows(merge_plan(target, source, ["k"], None, None)) == _rows(target)
    with pytest.raises(ValueError, match="when_matched"):
        merge_plan(target, source, ["k"], "upsert", None)
    with pytest.raises(ValueError, match="column mismatch"):
        merge_plan(target, source.drop("v"), ["k"])


def test_merge_into_publishes_atomically(spark, tmp_path):
    target, source = _frames(spark)
    path = str(tmp_path / "t")
    target.write.parquet(path)
    n = merge_into(spark, path, source, ["k"])
    assert n == 4
    assert _rows(spark.read.parquet(path)) == [
        (1, "a", 10.0), (2, "B", 200.0), (3, "c", 30.0), (4, "d", 40.0),
    ]
    # no swap debris
    assert not os.path.exists(path + ".merge.tmp")
    assert not os.path.exists(path + ".merge.bak")


def test_failed_staged_write_leaves_snapshot_intact(spark, tmp_path):
    target, _ = _frames(spark)
    path = str(tmp_path / "t")
    target.write.parquet(path)
    # a source whose evaluation fails mid-write (assert_true throws on
    # the executor during the staged write, before any rename)
    bad = target.withColumn("v", F.assert_true(F.col("k") < 0).cast("double") + 1)
    with pytest.raises(Exception):
        merge_into(spark, path, bad, ["k"])
    assert _rows(spark.read.parquet(path)) == _rows(target)  # untouched
    # and a retry with a good source succeeds despite the stale tmp
    _, source = _frames(spark)
    merge_into(spark, path, source, ["k"])
    assert len(_rows(spark.read.parquet(path))) == 4


def test_crash_between_swap_renames_is_recoverable(spark, tmp_path):
    """Simulate the narrowest crash window: the staged write finished
    and the live snapshot was renamed to .merge.bak, but the process
    died before the tmp rename. The next merge_into must first restore
    the old snapshot and then complete against it."""
    target, source = _frames(spark)
    path = str(tmp_path / "t")
    target.write.parquet(path)
    # manufacture the mid-swap state
    os.rename(path, path + ".merge.bak")
    assert not os.path.exists(path)
    assert recover_merge_target(path)  # restores the old snapshot
    assert _rows(spark.read.parquet(path)) == _rows(target)

    os.rename(path, path + ".merge.bak")  # again, now via merge_into itself
    n = merge_into(spark, path, source, ["k"])
    assert n == 4
    assert (2, "B", 200.0) in _rows(spark.read.parquet(path))
    assert not os.path.exists(path + ".merge.bak")


def test_duplicate_source_keys_rejected(spark, tmp_path):
    target, _ = _frames(spark)
    path = str(tmp_path / "t")
    target.write.parquet(path)
    dup = spark.createDataFrame(
        [(2, "B", 1.0), (2, "C", 2.0)], "k long, name string, v double"
    )
    with pytest.raises(ValueError, match="key-unique"):
        merge_into(spark, path, dup, ["k"])
    assert _rows(spark.read.parquet(path)) == _rows(target)
