"""Probe: q188 DSIR bucketing-cost variants (VERDICT r6 #7).

q188's honest cost is one md5 per bigram occurrence inside a NARROW
plan (bigram_structs is zip_with — no shuffle before the model
aggregate). Candidate variants, all exact-replayable in DuckDB:

- ``md5_15hex`` (current): conv(substr(md5(a||' '||b), 1, 15)) % 256
- ``md5_2hex``: conv(substr(md5(a||' '||b), 1, 2)) % 256 — same md5
  call, 7x shorter hex->int conversion
- ``token_window``: md5 per TOKEN occurrence (no concat) + integer
  combine of adjacent hashes via a doc-keyed lead() window — trades
  the per-bigram concat+md5 for a per-doc SHUFFLE
- ``token_zipwith``: md5 per token inside transform(), bigram bucket
  by zip_with integer combine — narrow like the current plan, one md5
  per token (n) instead of per bigram (n-1), no concat
- ``floor_nohash``: bucket = token-length arithmetic — NOT a usable
  model (degenerate buckets); measures the plan cost with hashing
  removed, i.e. the lower bound md5 competes against.

Each variant runs the FULL q188 shape (model build + broadcast score
join) on the documents corpus replicated m x (near-dup suffix
replicas, the bench_scale construction). Usage:
    python tools/dsir_probe.py [m] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators import text as T_ops
from batchprocessingetl_spark.session import get_spark

BUCKETS = 256
TARGET = "src0"
TOP = 50
TOKHASH_MOD = 2**20


def _score(bg: DataFrame) -> DataFrame:
    """The q188 model + scoring tail over a (doc_id, source, bucket)
    frame — shared by every variant."""
    spark = bg.sparkSession
    is_target = F.col("source") == TARGET
    tgt = bg.filter(is_target).groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    raw = bg.filter(~is_target).groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    spine = spark.range(BUCKETS).select(F.col("id").alias("bucket"))
    model = (
        spine.join(tgt, "bucket", "left")
        .join(raw, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
        )
    )
    totals = model.agg(F.sum("c_t").alias("tt"), F.sum("c_r").alias("tr"))
    lr = F.log((F.col("c_t") + 1).cast("double") / (F.col("tt") + BUCKETS)) - F.log(
        (F.col("c_r") + 1).cast("double") / (F.col("tr") + BUCKETS)
    )
    ratios = model.crossJoin(F.broadcast(totals)).select(
        "bucket", F.round(lr, 9).cast("decimal(28,10)").alias("lr")
    )
    return (
        bg.filter(~is_target)
        .join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("lr"), 6).cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP)
    )


def _bg_md5(docs: DataFrame, hexlen: int) -> DataFrame:
    g = docs.select(
        "doc_id",
        "source",
        F.explode(T_ops.bigram_structs(F.col("text"))).alias("g"),
    )
    return g.select(
        "doc_id",
        "source",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("g.a"), F.lit(" "), F.col("g.b"))),
                    1,
                    hexlen,
                ),
                16,
                10,
            ).cast("long")
            % BUCKETS
        ).alias("bucket"),
    )


def _bg_token_zipwith(docs: DataFrame) -> DataFrame:
    toks = T_ops.tokens(F.col("text"))
    hs = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % TOKHASH_MOD,
    )
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    buckets = F.zip_with(
        F.slice(hs, 1, m),
        F.slice(hs, 2, m),
        lambda a, b: (a * 1000003 + b) % BUCKETS,
    )
    return docs.select(
        "doc_id", "source", F.explode(buckets).alias("bucket")
    )


def _bg_token_window(docs: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window as W

    tp = docs.select(
        "doc_id",
        "source",
        F.posexplode(T_ops.tokens(F.col("text"))).alias("pos", "tok"),
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        % TOKHASH_MOD,
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        tp.withColumn("h2", F.lead("h").over(w))
        .filter(F.col("h2").isNotNull())
        .select(
            "doc_id",
            "source",
            ((F.col("h") * 1000003 + F.col("h2")) % BUCKETS).alias("bucket"),
        )
    )


def _bg_nohash(docs: DataFrame) -> DataFrame:
    toks = T_ops.tokens(F.col("text"))
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    buckets = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: (F.length(a) * 31 + F.length(b)) % BUCKETS,
    )
    return docs.select("doc_id", "source", F.explode(buckets).alias("bucket"))


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("dsir_probe")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    if m > 1:
        reps = spark.range(m).select(F.col("id").alias("rep"))
        docs = (
            docs.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") * m + F.col("rep")).alias("doc_id"),
                "source",
                F.when(F.col("rep") == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
                .alias("text"),
            )
        )
    docs = docs.localCheckpoint(eager=True)  # exclude read+replicate cost
    variants = {
        "md5_15hex": lambda: _bg_md5(docs, 15),
        "md5_2hex": lambda: _bg_md5(docs, 2),
        "token_zipwith": lambda: _bg_token_zipwith(docs),
        "token_window": lambda: _bg_token_window(docs),
        "floor_nohash": lambda: _bg_nohash(docs),
    }
    print(f"| variant (m={m}) | best of 2 (s) |")
    print("|---|---|")
    for name, make in variants.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _score(make()).collect()
            best = min(best, time.time() - t0)
        print(f"| {name} | {best:.2f} |")


if __name__ == "__main__":
    main()
