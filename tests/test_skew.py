"""Skew hardening under a MEASURED zipfian fixture (VERDICT r2 #4):
one key owns 20% of all rows. Pins (a) the salted join plan keeps the
salt in its join keys and its exchange budget, (b) the hot key's rows
actually spread across salt buckets (the task-balance property — no
reducer sees more than a small multiple of the mean), (c) salted
results == plain-join results, and (d) the session keeps AQE skew-join
splitting on as the planner-side backstop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators.skew import salted_join
from tests.conftest import SF_SMOKE

SALT_BUCKETS = 16


def _zipf_fixture(spark):
    """events with 20% of rows collapsed onto user 0."""
    ev = load_table(spark, SF_SMOKE, "events")
    skewed = ev.select(
        F.when(F.col("event_id") % 5 == 0, F.lit(0).cast("bigint"))
        .otherwise(F.col("user_id"))
        .alias("skew_user"),
        "value",
    )
    dim = (
        skewed.select("skew_user")
        .distinct()
        .withColumn("tier", F.pmod(F.col("skew_user"), F.lit(7)))
    )
    return skewed, dim


def test_fixture_is_actually_skewed(spark):
    skewed, _ = _zipf_fixture(spark)
    total = skewed.count()
    hot = skewed.filter(F.col("skew_user") == 0).count()
    assert hot >= 0.15 * total  # ~20% by construction


def test_salted_join_plan_keeps_salt_and_exchange_budget(spark):
    skewed, dim = _zipf_fixture(spark)
    out = salted_join(skewed, dim, ["skew_user"], salt_buckets=SALT_BUCKETS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the salt must survive into the physical join keys — losing it
    # silently reverts to the one-hot-reducer plan this guards against
    join_lines = [
        ln for ln in plan.splitlines()
        if ("SortMergeJoin" in ln or "ShuffledHashJoin" in ln or "BroadcastHashJoin" in ln)
    ]
    assert join_lines, plan
    assert any("__salt" in ln for ln in join_lines), join_lines
    # exchange budget: big-side shuffle + small-side shuffle at most
    # (broadcast of the replicated dim also acceptable); a third
    # exchange would mean the salt projection forced an extra shuffle
    n_exchanges = sum(
        1 for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln
    )
    assert n_exchanges <= 2, f"{n_exchanges} exchanges:\n{plan}"


def test_hot_key_spreads_across_salt_buckets(spark):
    # the task-balance property itself: after salting, the hot key's
    # rows land in SALT_BUCKETS groups of comparable size, so no
    # reducer processes the whole hot key
    skewed, _ = _zipf_fixture(spark)
    from batchprocessingetl_spark.operators.skew import _salt

    per_bucket = (
        skewed.filter(F.col("skew_user") == 0)
        .withColumn("__salt", _salt(SALT_BUCKETS))
        .groupBy("__salt")
        .count()
        .collect()
    )
    counts = [r["count"] for r in per_bucket]
    assert len(counts) == SALT_BUCKETS
    mean = sum(counts) / len(counts)
    assert max(counts) <= 3 * mean, counts


def test_salted_equals_plain_on_zipf_fixture(spark):
    skewed, dim = _zipf_fixture(spark)
    salted = (
        salted_join(skewed, dim, ["skew_user"], salt_buckets=SALT_BUCKETS)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    plain = (
        skewed.join(dim, "skew_user")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    got = {r["tier"]: (r["n"], r["v"]) for r in salted.collect()}
    want = {r["tier"]: (r["n"], r["v"]) for r in plain.collect()}
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0]
        assert abs(got[t][1] - want[t][1]) < 0.05


def test_session_keeps_aqe_skew_join_on(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
