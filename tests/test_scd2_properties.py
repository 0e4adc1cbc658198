"""Hypothesis property tests for the SCD2 merge (SURVEY.md §5.4):
randomized batch sequences must preserve the structural invariants no
example-based test can enumerate — exactly one current row per key,
non-overlapping contiguous validity intervals, and the current value
always equal to the latest snapshot that mentioned the key."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batchprocessingetl_spark.operators.scd2 import apply_scd2

KEYS = ["k1", "k2", "k3"]
VALUES = [None, "a", "b", "c"]

# a batch: subset of keys, each with an attribute value
batch_st = st.dictionaries(st.sampled_from(KEYS), st.sampled_from(VALUES), max_size=3)
batches_st = st.lists(batch_st, min_size=1, max_size=4)


def _ts(i: int) -> str:
    return f"2024-0{i + 1}-01 00:00:00"


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=batches_st)
def test_scd2_invariants_under_random_batch_sequences(spark, batches):
    dim = None
    last_value: dict[str, str | None] = {}
    mentioned: dict[str, int] = {}
    for i, batch in enumerate(batches):
        if not batch:
            continue
        new = spark.createDataFrame(
            [(k, v) for k, v in sorted(batch.items())], "pk string, attr string"
        )
        dim = apply_scd2(new, dim, ["pk"], ["attr"], _ts(i))
        for k, v in batch.items():
            last_value[k] = v
            mentioned[k] = i
        rows = [r.asDict() for r in dim.collect()]

        by_key: dict[str, list[dict]] = {}
        for r in rows:
            by_key.setdefault(r["pk"], []).append(r)
        assert set(by_key) == set(last_value)

        for k, krows in by_key.items():
            current = [r for r in krows if r["is_current"]]
            # exactly one current row per key, holding the latest value
            assert len(current) == 1
            assert current[0]["attr"] == last_value[k]
            assert current[0]["end_date"] is None
            # history rows are closed and intervals never overlap:
            # sorted by start, each end <= next start, all ends set
            closed = sorted(
                (r for r in krows if not r["is_current"]),
                key=lambda r: r["start_date"],
            )
            for r in closed:
                assert r["end_date"] is not None and r["start_date"] <= r["end_date"]
            spans = closed + current
            for a, b in zip(spans, spans[1:]):
                assert a["end_date"] is not None and a["end_date"] <= b["start_date"]


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batch=batch_st)
def test_scd2_merge_is_idempotent(spark, batch):
    """Re-delivering the same snapshot must be a no-op (change detection
    is null-safe equality, so identical attrs never re-version)."""
    if not batch:
        return
    new = spark.createDataFrame(
        [(k, v) for k, v in sorted(batch.items())], "pk string, attr string"
    )
    dim1 = apply_scd2(new, None, ["pk"], ["attr"], _ts(0))
    dim2 = apply_scd2(new, dim1, ["pk"], ["attr"], _ts(1))
    assert sorted(map(str, dim1.collect())) == sorted(map(str, dim2.collect()))
