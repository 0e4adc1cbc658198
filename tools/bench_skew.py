"""Salted-join vs AQE-skew-join bake-off (VERDICT r3 #7) on the q81
zipf fixture (20% of events on ONE hot key).

Four variants of the identical join+rollup, best-of-3 each:
  1. salted        — operators/skew.py::salted_join, 16 salt buckets
  2. smj-aqe       — plain sort-merge join, engine-default AQE
                     (skew split armed but gated on its default
                     256 MB / 5x partition thresholds)
  3. smj-aqe-tuned — same join with the skew thresholds lowered so
                     splitting actually triggers at this data size
                     (what the defaults would do at production scale)
  4. broadcast     — what the optimizer picks unforced (the dim is
                     tiny): the skew never materializes at all
Reports whether the final adaptive plan actually split the skewed
partition (isSkew=true markers). Prints a markdown table for
docs/SCALE.md.

Usage: python tools/bench_skew.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators.skew import salted_join
from batchprocessingetl_spark.session import get_spark

SALT_BUCKETS = 16
TUNED = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}
# splitting a skewed partition breaks the SMJ's output co-partitioning
# for the downstream aggregate, so AQE declines the optimization unless
# forced — the third knob real deployments need to know about
FORCED = {**TUNED, "spark.sql.adaptive.forceOptimizeSkewedJoin": "true"}


def fixture(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    skewed = ev.select(
        F.when(F.col("event_id") % 5 == 0, F.lit(0).cast("bigint"))
        .otherwise(F.col("user_id"))
        .alias("skew_user"),
        "value",
    )
    dim = (
        skewed.select("skew_user")
        .distinct()
        .withColumn("tier", F.pmod(F.col("skew_user"), F.lit(7)))
    )
    return skewed, dim


def rollup(j):
    return j.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("total_value"),
    )


def timed_with_split(df) -> tuple[float, bool]:
    """Best-of-3 wall time + whether the EXECUTED adaptive plan split a
    skewed partition. The plan must be read from the very DataFrame
    that ran (count() plans a different query), so one extra collect()
    drives the plan probe — the rollup output is 7 rows."""
    runs = []
    for _ in range(3):
        t0 = time.time()
        df.count()
        runs.append(time.time() - t0)
    df.collect()
    split = "skew=true" in df._jdf.queryExecution().executedPlan().toString()
    return min(runs), split


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_skew")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()  # warmup

    skewed, dim = fixture(spark, sf_dir)
    # the split-friendly shape: a multi-mapper left (the raw scan is a
    # single small file => ONE map task, and AQE splits skewed reduce
    # partitions at MAP-OUTPUT granularity — a 1-mapper shuffle is
    # indivisible) and a bare-shuffle dim (the distinct's HashAggregate
    # sits between the dim's shuffle stage and the join, defeating the
    # rule's SMJ(Sort(Shuffle), Sort(Shuffle)) pattern match)
    mat_dim = spark.createDataFrame(dim.collect(), dim.schema)
    rows = []

    t, _ = timed_with_split(rollup(salted_join(skewed, dim, ["skew_user"], SALT_BUCKETS)))
    rows.append(("salted_join (16 buckets)", t, "n/a (pre-split by salt)"))

    def run_with_confs(label, df_fn, confs, note_fn):
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            t, split = timed_with_split(df_fn())
            rows.append((label, t, note_fn(split)))
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def natural():
        return rollup(skewed.join(dim.hint("merge"), "skew_user"))

    def friendly():
        return rollup(
            skewed.repartition(32).join(mat_dim.hint("merge"), "skew_user")
        )

    note = "skew split fired: {}".format
    run_with_confs("plain SMJ (natural shape), AQE defaults", natural, {}, note)
    run_with_confs(
        "plain SMJ (natural shape), thresholds lowered", natural, TUNED, note
    )
    run_with_confs(
        "plain SMJ (natural shape), lowered + forced", natural, FORCED, note
    )
    run_with_confs(
        "plain SMJ (split-friendly shape), thresholds lowered",
        friendly,
        TUNED,
        note,
    )

    t, _ = timed_with_split(rollup(skewed.join(F.broadcast(dim), "skew_user")))
    rows.append(("broadcast join (optimizer's unforced pick)", t, "no shuffle of the hot key at all"))

    print(f"| variant | best-of-3 ({sf_dir.rsplit('/',1)[-1]}) | notes |")
    print("|---|---|---|")
    for name, t, note_s in rows:
        print(f"| {name} | {t:.3f} s | {note_s} |")


if __name__ == "__main__":
    main()
