"""Streaming jobs over file sources.

Each job takes a source directory + checkpoint dir and returns the
started StreamingQuery (or runs it to completion with availableNow).
``availableNow`` processes everything present then stops — the
streaming-native form of the reference's "poll until caught up" cycle,
with exactly-once progress tracked in the checkpoint instead of the
hand-rolled JSON watermark (raw_layer.py:70-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream with declared schema (streams require one —
    no inference race on new files)."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(source_dir)


def windowed_event_counts(events: DataFrame, window: str = "1 hour", late: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with a watermark for late data — the
    streaming twin of workload.events.q20 (same output schema), so batch
    and stream answers are comparable."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def run_available_now(agg: DataFrame, checkpoint_dir: str, query_name: str) -> None:
    """Drain everything currently available into an in-memory sink and
    stop — deterministic, synchronous; results land in the temp view
    ``query_name``. Swap format for parquet/kafka in production; the
    checkpoint carries offsets + state either way."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
) -> None:
    """Streaming version of the raw-layer incremental load
    (raw_layer.py:94-159): new files land append-only in the target;
    progress lives in the checkpoint, so re-runs are exactly-once
    without the union+dropDuplicates re-read the reference needs."""
    events = stream_events(spark, source_dir)
    q = (
        events.writeStream.outputMode("append")
        .format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
