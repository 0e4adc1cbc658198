"""Staging-layer cleaner (reference ``src/staging/staging_layer.py:32-93``).

One lazy pipeline instead of the reference's interleaved count()/show()
actions (each of which re-executed the whole upstream plan — SURVEY.md
§3.2): callers decide when to act. All transformations are narrow
except the full-row dedup (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batchprocessingetl_spark.schemas import STAGING_CASTS

FILLNA_DEFAULTS = {
    # staging_layer.py:63-70
    "stock_level": 0,
    "reorder_point": 0,
    "lead_time_days": 0,
    "carrying_cost": 0.0,
    "stock_out_risk": 0.0,
    "inventory_turnover": 0.0,
}


def duplicate_report(df: DataFrame) -> DataFrame:
    """Rows occurring more than once with their multiplicity
    (staging_layer.py:42-49: groupBy(all).count().filter(>1))."""
    return df.groupBy(*df.columns).count().filter(F.col("count") > 1)


def clean_inventory(df: DataFrame) -> DataFrame:
    """The staging chain (staging_layer.py:55-84), with the reference's
    exact semantics: full-row dedup -> drop null dates -> casts ->
    per-column null defaults -> derived ``profit_margin`` and
    ``is_restock_needed`` columns.

    ``profit_margin`` = total_sales - quantity_sold * unit_price where
    all three are present (staging_layer.py:77-80), else NULL.
    ``is_restock_needed`` = 'Yes' iff stock_level < reorder_point
    (staging_layer.py:81-84).
    """
    out = df.dropDuplicates().filter(F.col("date").isNotNull())
    for col, dtype in STAGING_CASTS.items():
        out = out.withColumn(col, F.col(col).cast(dtype))
    out = out.fillna(FILLNA_DEFAULTS)
    margin_inputs_present = (
        F.col("total_sales").isNotNull()
        & F.col("quantity_sold").isNotNull()
        & F.col("unit_price").isNotNull()
    )
    return out.withColumn(
        "profit_margin",
        F.when(
            margin_inputs_present,
            F.col("total_sales") - F.col("quantity_sold") * F.col("unit_price"),
        ).otherwise(F.lit(None)),
    ).withColumn(
        "is_restock_needed",
        F.when(F.col("stock_level") < F.col("reorder_point"), F.lit("Yes")).otherwise(F.lit("No")),
    )
