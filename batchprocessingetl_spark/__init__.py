"""batchprocessingetl_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL project (``ronankibharath98/
batchProcessingETL``): medallion pipeline operators (staging cleaner,
star-schema builder, SCD Type 2, incremental high-water-mark loading),
the reference's analytical query workload, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing) designed for a multi-executor
cluster even though CI runs on ``local[N]``.

Everything is declared through the DataFrame / Spark SQL API so Catalyst
and AQE pick physical strategies (broadcast vs sort-merge, partition
coalescing, skew handling); Python UDFs appear only as Arrow-vectorized
Pandas UDFs where no built-in expression exists.
"""

from batchprocessingetl_spark.catalog import TABLES, load_table, register_views
from batchprocessingetl_spark.session import get_spark

__all__ = ["TABLES", "get_spark", "load_table", "register_views"]
