"""Schema registry (SURVEY.md §1.1).

Explicit StructTypes for the reference's data model: the wide
``inventory`` source table (Postgres DDL at
``/root/reference/src/main.py:10-28``) and the watermark metadata
singleton (``src/raw/raw_layer.py:38``). Staging casts
(``src/staging/staging_layer.py:58-60``) are reflected in
``STAGING_CASTS``.
"""

from __future__ import annotations

from pyspark.sql import types as T

INVENTORY_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("date", T.TimestampType(), True),
        T.StructField("store_id", T.StringType(), True),
        T.StructField("store_location", T.StringType(), True),
        T.StructField("product_id", T.StringType(), True),
        T.StructField("product_category", T.StringType(), True),
        T.StructField("quantity_sold", T.IntegerType(), True),
        T.StructField("unit_price", T.DoubleType(), True),
        T.StructField("total_sales", T.DoubleType(), True),
        T.StructField("stock_level", T.IntegerType(), True),
        T.StructField("reorder_point", T.IntegerType(), True),
        T.StructField("lead_time_days", T.IntegerType(), True),
        T.StructField("carrying_cost", T.DoubleType(), True),
        T.StructField("stock_out_risk", T.DoubleType(), True),
        T.StructField("inventory_turnover", T.DoubleType(), True),
    ]
)

# staging_layer.py:58-60 casts unit_price/total_sales to DECIMAL and
# quantity_sold to INT after ingest
STAGING_CASTS = {
    "unit_price": "decimal(10,2)",
    "total_sales": "decimal(15,2)",
    "quantity_sold": "int",
}

# raw_layer.py:38 — watermark metadata singleton {last_processed: string}
METADATA_SCHEMA = T.StructType([T.StructField("last_processed", T.StringType(), True)])
