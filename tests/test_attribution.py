"""Attribution quartet: shared journey builders + cross-model credit
conservation (VERDICT r7 #6).

All four models (q146 positional, q242 Shapley, q250 Markov removal,
q267 time decay) consume operators/attribution.py's two builders on
the SAME events fixture, and each model's credits must sum to its own
conversion mass:

- q146: every attributed conversion's credits sum to exactly 1.
- q267: every attributed conversion's shares sum to 1 (9dp rounding);
  channel totals sum to the number of attributed conversions.
- q242: efficiency — sum(phi) = v(C) − v(∅), i.e. 6·Σphi_x6/6 equals
  the count of converting users with a non-empty pre-conversion touch
  set (computed independently from the shared journey builder).
- q250: removal effects live in [0, 1] and removing a channel never
  increases absorption (monotone vs the full chain), so the
  ΣRE-normalized credits conserve any conversion mass by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators.attribution import (
    conversion_touch_frame,
    first_conversion_journeys,
)
from batchprocessingetl_spark.workload import (
    collect_extra_queries,
    collect_queries,
)
from batchprocessingetl_spark.workload.events import (
    MTA_WINDOW_S,
    SHAPLEY_CHANNELS,
    TD_WINDOW_H,
)
from tests.conftest import SF_SMOKE

ALL = {**collect_queries(), **collect_extra_queries()}


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_positional_credits_sum_to_one_per_conversion(spark):
    rows = ALL["q146_multitouch_attribution"](spark, SF_SMOKE).collect()
    assert rows, "fixture must attribute at least one conversion"
    per_conv: dict[int, float] = {}
    for r in rows:
        per_conv[r.purchase_id] = per_conv.get(r.purchase_id, 0.0) + r.credit
    for pid, total in per_conv.items():
        # 6dp-rounded middles: error bounded by n_touches * 5e-7
        assert total == pytest.approx(1.0, abs=1e-4), pid


def test_time_decay_credits_sum_to_attributed_conversions(spark, events):
    out = ALL["q267_time_decay_attribution"](spark, SF_SMOKE).collect()
    attributed = (
        conversion_touch_frame(
            events, SHAPLEY_CHANNELS, TD_WINDOW_H * 3600, inclusive=False
        )
        .select("conversion_id")
        .distinct()
        .count()
    )
    assert attributed > 0
    total_credit = sum(r.total_credit for r in out)
    assert total_credit == pytest.approx(attributed, abs=1e-3)


def test_shapley_efficiency_vs_shared_journeys(spark, events):
    out = ALL["q242_shapley_attribution"](spark, SF_SMOKE).collect()
    journeys = first_conversion_journeys(events).filter(
        F.col("fp_rn").isNotNull()
    )
    touched = (
        journeys.filter(
            F.col("event_type").isin(*SHAPLEY_CHANNELS)
            & (F.col("ts") < F.col("first_conv_ts"))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    # efficiency: sum phi = v(C) - v(emptyset) = converting users with
    # a non-empty pre-conversion touch set; phi_x6 carries it exactly.
    assert sum(r.phi_x6 for r in out) == 6 * touched


def test_markov_removal_effects_bounded_and_monotone(spark):
    rows = {
        r.channel: r
        for r in ALL["q250_markov_removal_attribution"](
            spark, SF_SMOKE
        ).collect()
    }
    base = rows.pop("__full")
    assert base.conv_scaled > 0
    assert set(rows) == set(SHAPLEY_CHANNELS)
    for ch, r in rows.items():
        assert 0.0 <= r.removal_effect <= 1.0, ch
        assert r.conv_scaled <= base.conv_scaled, ch  # removal can't help
    # ΣRE-normalized credits trivially conserve mass; pin ΣRE > 0 so
    # the normalization is well-defined on this fixture.
    assert sum(r.removal_effect for r in rows.values()) > 0


def test_journey_builder_truncates_at_first_conversion(spark, events):
    j = first_conversion_journeys(events)
    bad = j.filter(
        F.col("fp_rn").isNotNull() & (F.col("rn") > F.col("fp_rn"))
    ).count()
    assert bad == 0
    # converting users end exactly at their first conversion row
    last = (
        j.filter(F.col("fp_rn").isNotNull())
        .groupBy("user_id")
        .agg(F.max("rn").alias("mx"), F.max("fp_rn").alias("fp"))
        .filter(F.col("mx") != F.col("fp"))
        .count()
    )
    assert last == 0


def test_touch_frame_respects_window_bounds(spark, events):
    frame = conversion_touch_frame(
        events, ("click",), MTA_WINDOW_S, inclusive=True
    )
    bad = frame.filter(
        (F.col("touch_ts") > F.col("conv_ts"))
        | (
            F.col("touch_ts")
            < F.col("conv_ts") - F.expr(f"INTERVAL {MTA_WINDOW_S} SECONDS")
        )
    ).count()
    assert bad == 0
