"""Hypothesis property tests for snapshot_diff and apply_scd1: the
algebraic laws that hold for ANY pair of snapshots — applying the diff
to the old snapshot reconstructs the new one exactly, and the SCD1
merge is the diff's 'apply' restricted to upserts."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batchprocessingetl_spark.operators.diff import snapshot_diff
from batchprocessingetl_spark.operators.scd2 import apply_scd1

KEYS = list(range(1, 7))
VALUES = [None, "a", "b", "c"]

snapshot_st = st.dictionaries(st.sampled_from(KEYS), st.sampled_from(VALUES), max_size=6)


def _df(spark, snap):
    if not snap:
        return spark.createDataFrame([], "k long, v string")
    return spark.createDataFrame([(k, v) for k, v in snap.items()], "k long, v string")


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(old=snapshot_st, new=snapshot_st)
def test_diff_apply_reconstructs_new_snapshot(spark, old, new):
    diff = snapshot_diff(_df(spark, old), _df(spark, new), ["k"]).collect()
    # classification is a partition of the key union
    assert {r["k"] for r in diff} == set(old) | set(new)
    reconstructed = {
        r["k"]: r["v_new"] for r in diff if r["diff_kind"] != "removed"
    }
    assert reconstructed == new
    # kinds agree with the dict semantics (null-safe)
    for r in diff:
        k = r["k"]
        if k not in old:
            assert r["diff_kind"] == "added"
        elif k not in new:
            assert r["diff_kind"] == "removed"
        elif old[k] == new[k]:
            assert r["diff_kind"] == "unchanged"
        else:
            assert r["diff_kind"] == "changed"


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(existing=snapshot_st, batch=snapshot_st)
def test_scd1_merge_is_dict_update(spark, existing, batch):
    out = apply_scd1(_df(spark, batch), _df(spark, existing), ["k"]).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {**existing, **batch}
    assert len(out) == len(got)  # one row per key
