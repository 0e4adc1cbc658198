"""Multimodal + Structured Streaming workload entries.

q60 exercises the multimodal binary-column plumbing end-to-end
(mapInPandas over Arrow batches); its byte-level outputs (length, md5)
are DuckDB-checkable even though the stub feature vector is not.

q61 runs the streaming tumbling-window job with an availableNow trigger
over a staged copy of the events table — checkpointed, synchronous,
rows-only (the driver's oracle runs batch SQL; the batch twin q20
already pins the window semantics).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators.multimodal import as_media_frame, extract_features


def q60_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents' text bytes treated as opaque media payloads -> Arrow-
    batched feature extraction. n_bytes/content_hash are exact
    (oracle-checked); the stub feature only contributes its dimension."""
    docs = load_table(spark, sf_dir, "documents")
    media = as_media_frame(docs.withColumn("payload", F.encode("text", "UTF-8")), "doc_id", "payload", "text")
    feats = extract_features(media)
    return feats.select(
        "doc_id",
        "kind",
        "n_bytes",
        "content_hash",
        F.size("feature").alias("feature_dim"),
    ).orderBy("doc_id")


def q61_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of q20: stage events as microsecond
    parquet, stream it back with availableNow + checkpoint, aggregate
    into tumbling windows, and read the durable snapshot back.

    Lifecycle: one work dir per Spark application (keyed by
    applicationId), wiped and recreated on each invocation — repeated
    runs in a session leave no orphan staging/checkpoint dirs, and the
    result round-trips through the parquet snapshot sink instead of a
    global temp-view side channel."""
    import shutil

    from batchprocessingetl_spark.streaming.jobs import (
        run_snapshot_to_parquet,
        stream_events,
        windowed_event_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    work = os.path.join(
        tempfile.gettempdir(), f"bpetl_stream_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "events")
    out = os.path.join(work, "out")
    ev.write.mode("overwrite").parquet(src)
    agg = windowed_event_counts(stream_events(spark, src), "1 hour")
    run_snapshot_to_parquet(agg, os.path.join(work, "ckpt"), out)
    return spark.read.parquet(out).orderBy("window_start", "event_type")


def q62_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (1 media row -> N frame rows inside the
    Arrow batch): documents' bytes as pseudo-video payloads, chunked to
    64-byte frames, every 4th kept. Byte-exact oracle: the emitted
    frames are compared as hex slices of the source payload."""
    from batchprocessingetl_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = as_media_frame(
        docs.withColumn("payload", F.encode("text", "UTF-8")), "doc_id", "payload", "video"
    )
    fr = sample_frames(media, frame_bytes=64, every_n=4)
    return fr.select(
        "doc_id", "frame_idx", "n_frame_bytes", F.hex("frame").alias("frame_hex")
    ).orderBy("doc_id", "frame_idx")


QUERIES = {
    "q60_multimodal_features": q60_multimodal_features,
    "q62_frame_sampling": q62_frame_sampling,
}

# Out of the ~50-entry driver registry budget: the streaming run is
# rows-only (no batch-SQL oracle for a streaming drain) and its window
# semantics are pinned by the oracle-checked batch twin q20;
# tests/test_streaming_state.py exercises the streaming path itself.
EXTRA_QUERIES = {
    "q61_streaming_hourly": q61_streaming_hourly,
}

ORACLE = {
    "q60_multimodal_features": """
        SELECT doc_id,
               'text' AS kind,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_hash,
               8 AS feature_dim
        FROM documents
        ORDER BY doc_id
    """,
    # q61: streaming surface, rows-only (batch twin q20 pins semantics).
    "q62_frame_sampling": """
        WITH f AS (
            SELECT doc_id, hex(encode(text)) AS ph,
                   octet_length(encode(text)) // 64 AS n
            FROM documents
        ), idx AS (
            SELECT doc_id, ph, unnest(range(0, n, 4)) AS frame_idx
            FROM f WHERE n > 0
        )
        SELECT doc_id, frame_idx::INT AS frame_idx, 64::INT AS n_frame_bytes,
               substring(ph, frame_idx::INT * 128 + 1, 128) AS frame_hex
        FROM idx
        ORDER BY doc_id, frame_idx
    """,
}
