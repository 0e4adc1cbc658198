"""Custom stateful streaming operator: per-user running totals via
applyInPandasWithState must accumulate ACROSS micro-batch runs through
the checkpointed state store."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from batchprocessingetl_spark.streaming.jobs import latest_user_totals, running_user_totals


def _rows(ids, hour):
    return [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1, hour, i % 60), user_id=i % 2,
            event_type="click", value=1.5, props="{}")
        for i in ids
    ]


def test_state_accumulates_across_runs(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.createDataFrame(_rows(range(4), 1)).write.mode("append").parquet(src)
    running_user_totals(spark, src, ckpt, out)
    got1 = {r["user_id"]: r for r in latest_user_totals(spark, out).collect()}
    assert got1[0]["n_events"] == 2 and got1[0]["total_value"] == 3.0

    # second run: new files, SAME checkpoint -> state must carry over
    spark.createDataFrame(_rows(range(4, 10), 2)).write.mode("append").parquet(src)
    running_user_totals(spark, src, ckpt, out)
    got2 = {r["user_id"]: r for r in latest_user_totals(spark, out).collect()}
    assert got2[0]["n_events"] == 5  # 2 from run1 + 3 from run2
    assert got2[0]["total_value"] == 7.5
    assert got2[1]["n_events"] == 5
