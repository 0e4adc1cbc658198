"""Incremental high-water-mark loader
(reference ``src/raw/raw_layer.py:94-159``).

Corrections over the reference, per SURVEY.md §7.2 step 3:

- The watermark stores the **full timestamp** (the reference truncates
  to day via ``strftime('%Y-%m-%d')`` at raw_layer.py:73, guaranteeing
  same-day re-reads).
- The merge is idempotent under re-delivery and overlap
  (union + full-row dropDuplicates, raw_layer.py:126), and property
  tests assert full-load == composition of incremental loads.
- At scale the merge should not rewrite the whole table: with a
  date-partitioned sink, only partitions >= watermark date are
  rewritten (dynamic partition overwrite); this module computes the
  frames, sinks decide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessingetl_spark.schemas import METADATA_SCHEMA

WATERMARK_FMT = "yyyy-MM-dd HH:mm:ss"


def extract_increment(source: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    """Rows strictly after the watermark; full load when None
    (raw_layer.py:112-118). The comparison is a plain predicate, so it
    pushes down into parquet/JDBC scans."""
    if watermark is None:
        return source
    return source.filter(F.col(ts_col) > F.lit(watermark).cast("timestamp"))


def merge_increment(existing: DataFrame | None, increment: DataFrame) -> DataFrame:
    """Idempotent merge (raw_layer.py:124-126): union + full-row dedup.
    Re-delivered rows collapse; the shuffle is one hash-dedup."""
    if existing is None:
        return increment.dropDuplicates()
    return existing.union(increment).dropDuplicates()


def compute_watermark(df: DataFrame, ts_col: str) -> DataFrame:
    """New watermark = max timestamp as a single-row metadata frame
    (raw_layer.py:70-74, full precision — not day-truncated)."""
    return df.agg(
        F.date_format(F.max(ts_col), WATERMARK_FMT).alias("last_processed")
    )


def read_watermark(spark: SparkSession, path: str) -> str | None:
    """Watermark from the JSON metadata singleton (raw_layer.py:81-91)."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.schema(METADATA_SCHEMA).json(path).collect()
    except AnalysisException:
        return None
    if not rows or rows[0]["last_processed"] is None:
        return None
    return rows[0]["last_processed"]


def write_watermark(df: DataFrame, path: str) -> None:
    """Persist the watermark frame as JSON (raw_layer.py:73-74)."""
    df.coalesce(1).write.mode("overwrite").json(path)


def incremental_load(
    spark: SparkSession,
    source: DataFrame,
    existing: DataFrame | None,
    ts_col: str,
    watermark_path: str,
    sink=None,
) -> DataFrame:
    """One polling cycle (raw_layer.py:109-135): read watermark ->
    extract increment -> idempotent merge -> persist data -> advance
    watermark.

    Durability ordering matches the reference (data parquet at
    raw_layer.py:124-135 lands BEFORE the metadata JSON at :73-74):
    advancing the watermark first would permanently skip the increment
    if the data persist then failed. When ``sink`` (callable taking the
    merged frame) is given, it runs before the watermark write and the
    watermark is computed from the sunk frame. Without a sink the
    merged frame is eagerly ``localCheckpoint``-ed first, so the
    returned frame can never lazily re-read a source that has moved
    past the recorded watermark."""
    wm = read_watermark(spark, watermark_path)
    inc = extract_increment(source, ts_col, wm)
    merged = merge_increment(existing, inc)
    if sink is not None:
        sink(merged)
    else:
        merged = merged.localCheckpoint(eager=True)
    write_watermark(compute_watermark(merged, ts_col), watermark_path)
    return merged
