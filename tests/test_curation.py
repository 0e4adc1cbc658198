"""Unit tests for operators/curation.py on crafted inputs (the
workload queries q67-q70 carry the DuckDB value parity; these pin exact
operator semantics on inputs engineered to hit every branch)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from batchprocessingetl_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_ngram_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear in this row"),
            (3, "we know the quick brown fox is a benchmark phrase"),
        ],
    )
    ev = _docs(spark, [(100, "quick brown fox")])
    out = {
        r["doc_id"]: r["is_contaminated"]
        for r in C.decontaminate(train, ev, "doc_id", "text", n=3).collect()
    }
    assert out == {1: True, 2: False, 3: True}


def test_decontaminate_short_docs_never_match(spark):
    train = _docs(spark, [(1, "quick brown")])  # < n tokens: no grams
    ev = _docs(spark, [(100, "quick brown fox")])
    out = C.decontaminate(train, ev, "doc_id", "text", n=3).collect()
    assert out[0]["is_contaminated"] is False


def test_repetition_signals_exact_values(spark):
    df = _docs(
        spark,
        [
            # 4 non-empty lines, 'dup dup' twice -> dup_line_frac 1/4
            (1, "dup dup\nunique one\ndup dup\n  \nlast line"),
            # all lines distinct; 'x y' bigram dominates: x y x y x ->
            # bigrams [x y, y x, x y, y x] -> top share 2/4
            (2, "x y x y x"),
        ],
    )
    rows = {r["doc_id"]: r for r in C.repetition_signals(df, "text").collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == pytest.approx(0.25)
    assert r1["max_line_repeat"] == 2
    r2 = rows[2]
    assert r2["n_lines"] == 1
    assert r2["dup_line_frac"] == 0.0
    assert r2["top_bigram_frac"] == pytest.approx(0.5)


def test_repetition_signals_degenerate_rows(spark):
    df = _docs(spark, [(1, ""), (2, "one")])
    rows = {r["doc_id"]: r for r in C.repetition_signals(df, "text").collect()}
    assert rows[1]["n_lines"] == 0
    assert rows[1]["dup_line_frac"] is None  # 0/0 -> null, not a crash
    assert rows[1]["max_line_repeat"] == 0
    assert rows[2]["n_lines"] == 1
    assert rows[2]["top_bigram_frac"] is None  # single token: no bigrams


def test_repetition_signals_plan_has_no_shuffle(spark):
    df = _docs(spark, [(1, "a b\na b")])
    plan = C.repetition_signals(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_rewrites_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail a.user+tag@sub.example.org and 192.168.0.1 and 555-123-4567 now"),
            (2, "no pii here at all"),
            (3, "two mails: x@y.io z@w.ai"),
        ],
    )
    rows = {r["doc_id"]: r for r in C.redact_pii(df, "text").collect()}
    assert rows[1]["redacted"] == "mail <EMAIL> and <IP> and <PHONE> now"
    assert (rows[1]["n_emails"], rows[1]["n_ipv4"], rows[1]["n_phones"]) == (1, 1, 1)
    assert rows[2]["redacted"] == "no pii here at all"
    assert rows[3]["n_emails"] == 2
    assert rows[3]["redacted"] == "two mails: <EMAIL> <EMAIL>"


def test_build_bloom_bitmap_is_small_and_complete(spark):
    keys = spark.range(0, 1000).select(F.xxhash64("id").alias("k"))
    bloom = C.build_bloom(keys, "k", n_bits=1 << 12, n_hashes=3)
    rows = bloom.collect()
    assert len(rows) <= (1 << 12) // 64
    assert all(r["bits"] != 0 for r in rows)


def test_bloom_incremental_dedup_matches_exact_anti_join(spark):
    corpus = _docs(spark, [(i, f"doc number {i}") for i in range(200)])
    # 50 dups of corpus content (different ids), 50 genuinely new
    new = _docs(
        spark,
        [(1000 + i, f"doc number {i}") for i in range(50)]
        + [(2000 + i, f"fresh content {i}") for i in range(50)],
    )
    out = C.bloom_incremental_dedup(new, corpus, "text", "doc_id", n_bits=1 << 14)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [2000 + i for i in range(50)]  # no false negatives, exact result


def test_bloom_probe_broadcasts_the_bitmap(spark):
    corpus = _docs(spark, [(i, f"doc {i}") for i in range(50)])
    new = _docs(spark, [(100 + i, f"doc {i}") for i in range(10)])
    plan = (
        C.bloom_incremental_dedup(new, corpus, "text", "doc_id", n_bits=1 << 12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
