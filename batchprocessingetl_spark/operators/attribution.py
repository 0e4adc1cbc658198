"""Shared journey builders for the multi-touch attribution quartet.

The four attribution models (q146 positional U-shape, q242 exact
Shapley, q250 Markov removal effect, q267 time decay) previously each
rebuilt their journey/touch frame inline in ``workload/events.py``
(VERDICT r7 #6). The quartet actually consumes two canonical frames:

- ``conversion_touch_frame`` — the (conversion, touch) grain: one row
  per channel touch by the converting user inside a lookback window
  before the conversion. A user-keyed interval join (equi-join on the
  user key, the time range as a post-join filter), so the pair count
  is bounded by touches-within-window per conversion, never corpus².
  Consumers: q146 (positional credits over per-conversion windows),
  q267 (2^(−Δt/halflife) recency weights).

- ``first_conversion_journeys`` — the per-user ordered event sequence
  truncated at the FIRST conversion (inclusive). One row_number pass
  keyed by user; non-converting users keep their full history with a
  NULL ``fp_rn``. Consumers: q250 (first-order transition pairs,
  START→…→PURCHASE|NULL), q242 (pre-conversion channel-set masks via
  ``ts < first_conv_ts`` over converting users).

Cross-model conservation (each model's credits sum to its conversion
mass on a shared fixture) is pinned by tests/test_attribution.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversion_touch_frame(
    events: DataFrame,
    channels: Sequence[str],
    lookback_seconds: int,
    *,
    inclusive: bool = True,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(conversion, touch) rows: every ``channels`` touch by the same
    user within ``lookback_seconds`` before the conversion event.

    ``inclusive`` controls whether a touch exactly at the conversion
    timestamp counts (q146's historical contract) or not (q267's).
    Columns: conversion_id, user_id, conv_ts, touch_id, channel,
    touch_ts.
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = events.filter(F.col(type_col).isin(*channels)).select(
        F.col(id_col).alias("touch_id"),
        F.col(user_col).alias("__t_user"),
        F.col(type_col).alias("channel"),
        F.col(ts_col).alias("touch_ts"),
    )
    upper = (
        F.col("touch_ts") <= F.col("conv_ts")
        if inclusive
        else F.col("touch_ts") < F.col("conv_ts")
    )
    return conv.join(
        touch,
        (F.col("__t_user") == F.col("user_id"))
        & upper
        & (
            F.col("touch_ts")
            >= F.col("conv_ts")
            - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS")
        ),
    ).drop("__t_user")


def first_conversion_journeys(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event sequence truncated at the first conversion.

    One row per kept event with ``rn`` (1-based position under the
    deterministic (ts, id) order), ``fp_rn`` (position of the user's
    first conversion; NULL for never-converting users, whose full
    history is kept) and ``first_conv_ts``. The frame is ONE window
    pass plus a per-user min aggregate — the fact table is touched
    once.
    """
    seq = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    rn = events.select(
        user_col,
        type_col,
        ts_col,
        F.row_number().over(seq).alias("rn"),
    )
    fp = (
        rn.filter(F.col(type_col) == conversion_type)
        .groupBy(user_col)
        .agg(
            F.min("rn").alias("fp_rn"),
            F.min(ts_col).alias("first_conv_ts"),
        )
    )
    return rn.join(fp, user_col, "left").filter(
        F.col("fp_rn").isNull() | (F.col("rn") <= F.col("fp_rn"))
    )
