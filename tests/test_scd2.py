"""SCD2 merge semantics — pins the corrected behavior for the four
reference bug classes (SURVEY.md §2.11 B1-B4) plus the structural
invariants every SCD2 dimension must hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.operators.scd2 import apply_scd2, resolve_grain
from tests.conftest import ts

BATCH1 = "2024-01-01 00:00:00"
BATCH2 = "2024-06-01 00:00:00"


def _existing(spark):
    return apply_scd2(
        spark.createDataFrame(
            [("k1", "a", 1.0), ("k2", "b", 2.0), ("k3", None, 3.0)],
            "pk string, attr string, num double",
        ),
        None,
        ["pk"],
        ["attr", "num"],
        BATCH1,
    )


def _merge(spark, new_rows):
    new = spark.createDataFrame(new_rows, "pk string, attr string, num double")
    return apply_scd2(new, _existing(spark), ["pk"], ["attr", "num"], BATCH2)


def rows_by_key(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["pk"], []).append(r.asDict())
    return out


def test_initial_load_all_current(spark):
    out = _existing(spark).collect()
    assert len(out) == 3
    assert all(r["is_current"] for r in out)
    assert all(r["end_date"] is None for r in out)
    assert all(r["start_date"] == ts(BATCH1) for r in out)


def test_unchanged_rows_pass_through(spark):
    # B1: the reference expires exactly the UNCHANGED keys; corrected
    # semantics keep them untouched
    out = rows_by_key(_merge(spark, [("k1", "a", 1.0)]))
    assert len(out["k1"]) == 1
    assert out["k1"][0]["is_current"] and out["k1"][0]["start_date"] == ts(BATCH1)


def test_changed_key_gets_expired_plus_new(spark):
    out = rows_by_key(_merge(spark, [("k1", "a2", 1.0)]))
    versions = sorted(out["k1"], key=lambda r: r["is_current"])
    assert len(versions) == 2
    old, new = versions
    assert not old["is_current"] and old["end_date"] == ts(BATCH2) and old["attr"] == "a"
    assert new["is_current"] and new["end_date"] is None and new["attr"] == "a2"
    assert new["start_date"] == ts(BATCH2)


def test_brand_new_key_inserted(spark):
    # B2: reference silently drops brand-new keys
    out = rows_by_key(_merge(spark, [("k9", "z", 9.0)]))
    assert len(out["k9"]) == 1
    assert out["k9"][0]["is_current"] and out["k9"][0]["start_date"] == ts(BATCH2)


@pytest.mark.parametrize(
    "new_row",
    [("k1", None, 1.0), ("k3", "now-set", 3.0)],
    ids=["value-to-null", "null-to-value"],
)
def test_null_transitions_detected(spark, new_row):
    # B3: null-unsafe != never fires on NULL transitions; eqNullSafe does
    out = rows_by_key(_merge(spark, [new_row]))
    assert len(out[new_row[0]]) == 2


def test_absent_key_untouched(spark):
    out = rows_by_key(_merge(spark, [("k1", "a2", 1.0)]))
    assert len(out["k2"]) == 1 and out["k2"][0]["is_current"]


def test_invariants_after_two_batches(spark):
    merged = _merge(spark, [("k1", "a2", 1.0), ("k9", "z", 9.0), ("k3", "s", 3.0)])
    cur = merged.filter(F.col("is_current")).groupBy("pk").count().collect()
    assert all(r["count"] == 1 for r in cur)  # exactly one current row per key
    # non-overlapping validity: every expired row ends when the next starts
    expired = merged.filter(~F.col("is_current")).collect()
    assert all(r["end_date"] == ts(BATCH2) for r in expired)


def test_resolve_grain_deterministic(spark):
    # B4: multi-row-per-key input resolved by explicit preference order
    df = spark.createDataFrame(
        [("k1", "x", 1.0), ("k1", "y", 2.0), ("k2", "z", 3.0)],
        "pk string, attr string, num double",
    )
    out = resolve_grain(df, ["pk"], [F.desc("num")]).collect()
    got = {r["pk"]: r["attr"] for r in out}
    assert got == {"k1": "y", "k2": "z"}


def test_scd1_upsert_semantics(spark):
    from batchprocessingetl_spark.operators.scd2 import apply_scd1

    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    batch = spark.createDataFrame(
        [(2, "B"), (3, "c"), (4, "d")], "k long, v string"
    )
    out = {r["k"]: r["v"] for r in apply_scd1(batch, existing, ["k"]).collect()}
    # key 1 carried, 2 overwritten, 3 unchanged-but-batch-wins, 4 inserted
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}
    # initial load passes the batch through
    init = apply_scd1(batch, None, ["k"])
    assert init.count() == 3


def test_scd1_rejects_column_mismatch(spark):
    import pytest as _pytest

    from batchprocessingetl_spark.operators.scd2 import apply_scd1

    a = spark.createDataFrame([(1, "a")], "k long, v string")
    b = spark.createDataFrame([(1, "a", 2.0)], "k long, v string, w double")
    with _pytest.raises(ValueError, match="column mismatch"):
        apply_scd1(a, b, ["k"])


def test_as_of_time_travel(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from batchprocessingetl_spark.operators.scd2 import as_of

    rows = [
        # key 1: v1 [2020, 2022), v2 [2022, open)
        (1, "v1", dt.datetime(2020, 1, 1), dt.datetime(2022, 1, 1), False),
        (1, "v2", dt.datetime(2022, 1, 1), None, True),
        # key 2: born 2023
        (2, "w1", dt.datetime(2023, 1, 1), None, True),
    ]
    dim = spark.createDataFrame(
        rows, "k long, val string, start_date timestamp, end_date timestamp, is_current boolean"
    )
    def snap(ts):
        return {r["k"]: r["val"] for r in as_of(dim, ts).collect()}

    assert snap("2021-06-01 00:00:00") == {1: "v1"}          # key 2 not born
    assert snap("2022-01-01 00:00:00") == {1: "v2"}          # boundary: start inclusive, end exclusive
    assert snap("2023-06-01 00:00:00") == {1: "v2", 2: "w1"}
    # the filter is pushable: no joins/windows/shuffles in the plan
    plan = as_of(dim, "2021-01-01 00:00:00")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
