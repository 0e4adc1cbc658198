"""CDC changelog compaction semantics (operators/cdc.py).

Pins the latest-version-wins algebra: out-of-order delivery, winning
deletes, deterministic tie-break, and incremental re-compaction
(snapshot + new slice == full-log compaction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessingetl_spark.operators.cdc import apply_changelog

COLS = ["k", "version", "op", "val"]


def _log(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_latest_version_wins_out_of_order(spark):
    log = _log(
        spark,
        [
            (1, 3, "U", "newest"),
            (1, 1, "I", "oldest"),
            (1, 2, "U", "middle"),
            (2, 1, "I", "only"),
        ],
    )
    out = {r["k"]: r["val"] for r in apply_changelog(log, ["k"]).collect()}
    assert out == {1: "newest", 2: "only"}


def test_winning_delete_erases_key(spark):
    log = _log(
        spark,
        [(1, 1, "I", "a"), (1, 2, "D", None), (2, 1, "I", "b"), (2, 2, "D", None), (2, 3, "I", "revived")],
    )
    out = {r["k"]: r["val"] for r in apply_changelog(log, ["k"]).collect()}
    # key 1: delete is latest -> gone; key 2: re-insert after delete wins
    assert out == {2: "revived"}


def test_version_tie_breaks_deterministically(spark):
    # same version twice: struct-max tie-break = lexicographic on
    # (op, payload) -> 'U'/'z' beats 'I'/'a'; rerun must agree
    log = _log(spark, [(1, 5, "I", "a"), (1, 5, "U", "z")])
    for _ in range(2):
        rows = apply_changelog(log.repartition(4), ["k"]).collect()
        assert [(r["k"], r["val"]) for r in rows] == [(1, "z")]


def test_incremental_equals_full_compaction(spark):
    full = [
        (1, 1, "I", "a"),
        (1, 2, "U", "b"),
        (2, 1, "I", "c"),
        (2, 3, "D", None),
        (3, 2, "I", "d"),
    ]
    whole = apply_changelog(_log(spark, full), ["k"])
    # compact the first slice, then re-feed the snapshot (as inserts at
    # its high-water version) plus the remaining slice
    first = apply_changelog(_log(spark, full[:3]), ["k"])
    carried = first.select(
        "k", F.lit(2).alias("version"), F.lit("I").alias("op"), "val"
    )
    rest = _log(spark, full[3:])
    incr = apply_changelog(carried.unionByName(rest), ["k"])
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, incr.collect()))


def test_composite_key_and_payload_order(spark):
    df = spark.createDataFrame(
        [(1, "x", 1, "I", 10.0, "p"), (1, "x", 2, "U", 20.0, "q"), (1, "y", 1, "I", 5.0, "r")],
        ["a", "b", "version", "op", "m", "n"],
    )
    out = apply_changelog(df, ["a", "b"])
    assert out.columns == ["a", "b", "m", "n"]
    got = {(r["a"], r["b"]): (r["m"], r["n"]) for r in out.collect()}
    assert got == {(1, "x"): (20.0, "q"), (1, "y"): (5.0, "r")}


def test_plan_is_single_aggregate_no_window(spark):
    # struct-max lowers to SortAggregate (structs aren't hash-agg
    # buffer types) but MUST keep the map-side partial_max and MUST
    # NOT need a window sort over versions or any join
    log = _log(spark, [(1, 1, "I", "a")])
    plan = apply_changelog(log, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan
    assert "Join" not in plan
