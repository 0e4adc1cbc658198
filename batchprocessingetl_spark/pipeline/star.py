"""Star-schema builder (reference ``src/curated/curated_layer.py:80-145``).

Differences from the reference, per SURVEY.md §7.3 (intent, not bugs):

- Dimensions are built at **one row per key** (latest by a deterministic
  preference order) instead of ``select(...).distinct()`` — the
  reference's non-unique grain makes every dashboard join fan out
  (SURVEY §1.1 note). ``distinct_dim`` reproduces the literal reference
  behavior for parity checks.
- SCD2 versioning uses the corrected merge (operators/scd2.py) with an
  injected batch timestamp, not ``current_timestamp()``.
- ``fact_sales`` can be written partitioned by date — at 100 TB the
  date-partitioned fact is what makes time-range queries prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batchprocessingetl_spark.operators.scd2 import apply_scd2, resolve_grain

DIM_STORE_COLS = [
    # curated_layer.py:93-100
    "store_location",
    "reorder_point",
    "lead_time_days",
    "carrying_cost",
    "stock_out_risk",
]
DIM_PRODUCT_COLS = ["product_category", "unit_price"]  # curated_layer.py:115-119
FACT_COLS = [
    # curated_layer.py:133-141
    "transaction_id",
    "date",
    "store_id",
    "product_id",
    "quantity_sold",
    "total_sales",
    "stock_level",
]


def build_dim_date(staging: DataFrame) -> DataFrame:
    """dim_date: distinct dates + extracted parts (curated_layer.py:81-85).
    The join key ``date_id`` is the raw timestamp — code is ground truth
    over the ER diagram (SURVEY §1.1)."""
    return (
        staging.select(F.col("date").alias("date_id"))
        .distinct()
        .withColumn("year", F.year("date_id"))
        .withColumn("month", F.month("date_id"))
        .withColumn("day", F.dayofmonth("date_id"))
    )


def snapshot_dim(staging: DataFrame, key: str, attr_cols: list[str]) -> DataFrame:
    """Current attribute snapshot at one row per key: latest row wins,
    ties broken deterministically (fixes the reference's non-unique
    grain, SURVEY §2.11 B4). One window shuffle on the key."""
    projected = staging.select(key, "date", *attr_cols)
    resolved = resolve_grain(
        projected,
        [key],
        [F.desc("date")] + [F.desc_nulls_last(c) for c in attr_cols],
    )
    return resolved.drop("date")


def distinct_dim(staging: DataFrame, key: str, attr_cols: list[str]) -> DataFrame:
    """The reference's literal dim build (select().distinct(),
    curated_layer.py:93-100,115-119) — kept for parity checks."""
    return staging.select(key, *attr_cols).distinct()


def build_dim_store(staging: DataFrame, existing: DataFrame | None, batch_ts: str) -> DataFrame:
    """SCD2-versioned store dimension (curated_layer.py:102-107)."""
    return apply_scd2(
        snapshot_dim(staging, "store_id", DIM_STORE_COLS),
        existing,
        primary_key=["store_id"],
        update_columns=DIM_STORE_COLS,
        batch_ts=batch_ts,
    )


def build_dim_product(staging: DataFrame, existing: DataFrame | None, batch_ts: str) -> DataFrame:
    """SCD2-versioned product dimension (curated_layer.py:121-126)."""
    return apply_scd2(
        snapshot_dim(staging, "product_id", DIM_PRODUCT_COLS),
        existing,
        primary_key=["product_id"],
        update_columns=DIM_PRODUCT_COLS,
        batch_ts=batch_ts,
    )


def build_fact_sales(staging: DataFrame) -> DataFrame:
    """Fact projection (curated_layer.py:133-141). Narrow — no shuffle."""
    return staging.select(*FACT_COLS)


def build_star(
    staging: DataFrame,
    batch_ts: str,
    existing_dim_store: DataFrame | None = None,
    existing_dim_product: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full curated layer in one call: the reference's entry point 3
    (SURVEY §3.3) minus the per-stage writes — callers pick sinks."""
    return {
        "dim_date": build_dim_date(staging),
        "dim_store": build_dim_store(staging, existing_dim_store, batch_ts),
        "dim_product": build_dim_product(staging, existing_dim_product, batch_ts),
        "fact_sales": build_fact_sales(staging),
    }
