"""Focused pins for the r15 plan-level optimizations: each one asserts
the EQUIVALENCE the optimization relies on, so a later refactor cannot
silently break the argument the speedup was shipped on.

- tokens() lambda-free form == the old filter-lambda form.
- BM25's tokenize-free stats pass: regexp_count(text, '\\S+') ==
  size(tokens(text)) on every boundary case (the coalesce(-1)
  replicates size(NULL) = -1).
- Hashed shingles == xxhash64 of string shingles, elementwise.
- The q37 shingle-barrier size gate changes the PLAN, never the rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


EDGE_TEXTS = [
    (1, None),
    (2, ""),
    (3, "   "),
    (4, "one"),
    (5, "  leading and   trailing  "),
    (6, "tab\tsep\nnewline mixed   runs"),
    (7, "a b c d e f g"),
]


def test_tokens_matches_filter_lambda_form(spark):
    from batchprocessingetl_spark.operators.text import tokens

    df = spark.createDataFrame(EDGE_TEXTS, "id int, text string")
    old = F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))
    rows = df.select(
        "id", tokens(F.col("text")).alias("new"), old.alias("old")
    ).collect()
    for r in rows:
        assert r.new == r.old, f"id={r.id}: {r.new} != {r.old}"


def test_bm25_stats_regexp_count_equals_token_size(spark):
    """dl == size(tokens(text)) must equal the stats pass's
    regexp_count(text, '\\S+') on every edge case, including NULL
    text, where BOTH forms yield NULL (size of a NULL array is NULL
    on this Spark — an earlier coalesce(-1) draft diverged here)."""
    from batchprocessingetl_spark.operators.text import tokens

    df = spark.createDataFrame(EDGE_TEXTS, "id int, text string")
    rows = df.select(
        "id",
        F.size(tokens(F.col("text"))).alias("via_tokens"),
        F.regexp_count("text", F.lit(r"\S+")).alias("via_regexp"),
    ).collect()
    for r in rows:
        assert r.via_tokens == r.via_regexp, r

    # and on real corpus text
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    mismatches = (
        docs.select(
            F.size(tokens(F.col("text"))).alias("a"),
            F.regexp_count("text", F.lit(r"\S+")).alias("b"),
        )
        .filter(~F.col("a").eqNullSafe(F.col("b")))
        .count()
    )
    assert mismatches == 0


def test_hashed_shingles_equal_xxhash_of_string_shingles(spark):
    from batchprocessingetl_spark.operators.dedup import shingle_frame

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(200)
    s = shingle_frame(docs, "doc_id", "text", 3).select(
        "id", F.transform("sh", lambda x: F.xxhash64(x)).alias("expect")
    )
    h = shingle_frame(docs, "doc_id", "text", 3, hashed=True).select(
        "id", F.col("sh").alias("got")
    )
    bad = (
        s.join(h, "id")
        .filter(F.col("expect") != F.col("got"))
        .count()
    )
    assert bad == 0


def test_minhash_barrier_gate_does_not_change_rows(spark, monkeypatch):
    """SPARK_GRAFT_SHINGLE_BARRIER_MIN_BYTES=0 forces the shingle
    barrier on; a huge value forces it off. Same pairs either way."""
    from batchprocessingetl_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    def pairs():
        return sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in minhash_dedup_pairs(docs, "doc_id", "text").collect()
        )

    monkeypatch.setenv("SPARK_GRAFT_SHINGLE_BARRIER_MIN_BYTES", "0")
    forced_on = pairs()
    monkeypatch.setenv("SPARK_GRAFT_SHINGLE_BARRIER_MIN_BYTES", "999999999999")
    forced_off = pairs()
    assert forced_on == forced_off
    assert len(forced_on) > 0


def test_setcover_covered_gate_does_not_change_rows(spark, monkeypatch):
    """The set-cover covered-set strategy (lazy union vs per-round
    barrier, SPARK_GRAFT_COVERED_BARRIER_MIN_BYTES) must never change
    the picked rounds."""
    from batchprocessingetl_spark.workload.textops import q275_setcover_selection

    def rounds():
        return [
            (r.round, r.doc_id, r.gain, r.covered)
            for r in q275_setcover_selection(spark, SF_SMOKE).collect()
        ]

    monkeypatch.setenv("SPARK_GRAFT_COVERED_BARRIER_MIN_BYTES", "0")
    barriered = rounds()
    monkeypatch.setenv("SPARK_GRAFT_COVERED_BARRIER_MIN_BYTES", "999999999999")
    lazy = rounds()
    assert barriered == lazy
    assert len(barriered) > 0
