"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles runtime skew
for plain shuffle-to-shuffle joins at production partition sizes, but
it has two structural gates measured in docs/SCALE.md (round-4 probe):
it pattern-matches only SMJ(Sort(Shuffle), Sort(Shuffle)) — a dim
derived by distinct/aggregate in the same query defeats the rule — and
it splits skewed partitions at map-output granularity, so few-mapper
shuffles are indivisible. These operators are the explicit,
planner-independent control that works on every plan shape, for
pathological key distributions (a handful of keys owning most rows —
e.g. a null-ish default key, a bot user, boilerplate dedup buckets):

- :func:`salted_agg` — two-phase aggregation: rows get a deterministic
  salt, partial-aggregate on (key, salt) spreads a hot key over
  ``salt_buckets`` reducers, then a final cheap aggregate on the key
  combines partials. Only decomposable aggregates (sum/count/min/max)
  qualify; avg = sum/count downstream.
- :func:`salted_join` — big-side rows get a salt, the small side is
  replicated once per salt value, and the join key becomes
  (key, salt): a hot key's rows land on ``salt_buckets`` different
  partitions instead of one. Replication multiplies the small side, so
  keep it for genuinely small-but-unbroadcastable sides.

Salts derive from ``monotonically_increasing_id`` (deterministic for a
fixed partition layout, uniform, no RNG in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DECOMPOSABLE = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _salt(buckets: int):
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (func, column), func in sum/count/min/max.
    Semantically identical to ``df.groupBy(keys).agg(...)`` — the
    oracle-checked workload query q43 pins that equivalence."""
    unknown = {f for f, _ in aggs.values()} - set(_DECOMPOSABLE)
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {unknown}")
    partial = (
        df.withColumn("__salt", _salt(salt_buckets))
        .groupBy(*keys, "__salt")
        .agg(*[_DECOMPOSABLE[f](c).alias(name) for name, (f, c) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[f](name).alias(name) for name, (f, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    per salt value, join on (on + salt)."""
    big_s = big.withColumn("__salt", _salt(salt_buckets))
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"))
    )
    return big_s.join(small_r, [*on, "__salt"], how).drop("__salt")
