"""Deterministic sampling operators: exact stratified caps and stable
hash splits, verified differentially against DuckDB (md5 ordering is
engine-independent, so the oracle reproduces the exact sample)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators.sampling import (
    split_train_holdout,
    stratified_sample,
)
from tests.conftest import SF_SMOKE


def test_stratified_sample_exact_counts_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    sampled = stratified_sample(docs, "source", 30, "doc_id", seed="s1")
    counts = {
        r["source"]: r["n"]
        for r in sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    full = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, n in counts.items():
        assert n == min(30, full[src])  # EXACT per-stratum cap
    # deterministic: re-running yields the identical id set
    ids1 = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(docs, "source", 30, "doc_id", seed="s1")
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2
    # a different seed picks a different sample (cap of 5 << stratum
    # size so the choice actually varies)
    ids_a = {
        r["doc_id"]
        for r in stratified_sample(docs, "source", 5, "doc_id", seed="s1")
        .select("doc_id")
        .collect()
    }
    ids_b = {
        r["doc_id"]
        for r in stratified_sample(docs, "source", 5, "doc_id", seed="s2")
        .select("doc_id")
        .collect()
    }
    assert ids_a != ids_b


def test_stratified_sample_matches_duckdb_oracle(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "source", 20, "doc_id", seed="sx")
        .select("doc_id")
        .collect()
    )
    want = [
        r[0]
        for r in duckdb.sql(
            f"""
            SELECT doc_id FROM (
                SELECT doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY md5('sx:' || doc_id::VARCHAR), doc_id
                       ) AS rk
                FROM read_parquet('{SF_SMOKE}/documents.parquet')
            ) WHERE rk <= 20 ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want  # byte-identical sample across engines


def test_split_is_stable_partition_of_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    split = split_train_holdout(docs, "doc_id", 0.2, seed="v1")
    n = docs.count()
    by = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by.get("train", 0) + by.get("holdout", 0) == n  # exactly one split each
    assert 0.10 * n < by.get("holdout", 0) < 0.30 * n  # ~20% (hash-uniform)
    # membership is stable under corpus growth: the half-corpus split
    # agrees with the full-corpus split on every shared row
    half = split_train_holdout(docs.filter(F.col("doc_id") % 2 == 0), "doc_id", 0.2, seed="v1")
    joined = half.select("doc_id", F.col("split").alias("s2")).join(
        split.select("doc_id", "split"), "doc_id"
    )
    assert joined.filter(F.col("split") != F.col("s2")).count() == 0


def test_split_rejects_bad_fraction(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        split_train_holdout(docs, "doc_id", 1.5)


def test_mixture_sample_matches_duckdb_oracle(spark):
    from batchprocessingetl_spark.operators.sampling import mixture_sample

    docs = load_table(spark, SF_SMOKE, "documents")
    fr = {"src0": 0.3, "src1": 1.0, "src2": 0.05}
    out = mixture_sample(docs, "source", fr, "doc_id", seed="m1")
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert got != sorted(r["doc_id"] for r in docs.select("doc_id").collect())  # not vacuous
    cut_a, cut_c = int(0.3 * 16**15), int(0.05 * 16**15)
    want = [
        r[0]
        for r in duckdb.sql(
            f"""
            SELECT doc_id FROM (
                SELECT doc_id, source,
                       ('0x' || substr(md5('m1:' || doc_id::VARCHAR), 1, 15))::BIGINT AS b
                FROM read_parquet('{SF_SMOKE}/documents.parquet')
            )
            WHERE b < CASE source WHEN 'src0' THEN {cut_a}
                                  WHEN 'src2' THEN {cut_c}
                                  ELSE {16**15} END
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want  # byte-identical membership across engines


def test_mixture_sample_proportions_and_stability(spark):
    from batchprocessingetl_spark.operators.sampling import mixture_sample

    docs = load_table(spark, SF_SMOKE, "documents")
    full = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    some = next(iter(full))
    out = mixture_sample(docs, "source", {some: 0.5}, "doc_id", seed="m2")
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # unlisted strata kept in full; listed stratum roughly halved
    for src, n in full.items():
        if src != some:
            assert by[src] == n
    assert 0.25 * full[some] < by.get(some, 0) < 0.75 * full[some]
    # membership is a pure function of (seed, key): growth-stable
    half = mixture_sample(docs.filter(F.col("doc_id") % 2 == 0), "source", {some: 0.5}, "doc_id", seed="m2")
    ids_half = {r["doc_id"] for r in half.select("doc_id").collect()}
    ids_full = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids_half == {i for i in ids_full if i % 2 == 0}
    # narrow plan: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mixture_sample_rejects_bad_fraction(spark):
    from batchprocessingetl_spark.operators.sampling import mixture_sample

    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        mixture_sample(docs, "source", {"web": -0.1}, "doc_id")


def test_weighted_sample_size_determinism_and_layout_independence(spark):
    from batchprocessingetl_spark.operators.sampling import weighted_sample

    docs = load_table(spark, SF_SMOKE, "documents")
    s1 = sorted(r["doc_id"] for r in weighted_sample(docs, "doc_id", "n_chars", 50).collect())
    assert len(s1) == 50 and len(set(s1)) == 50
    # same draw regardless of physical partitioning
    s2 = sorted(
        r["doc_id"]
        for r in weighted_sample(docs.repartition(7), "doc_id", "n_chars", 50).collect()
    )
    assert s1 == s2
    # different seed -> different draw
    s3 = sorted(
        r["doc_id"] for r in weighted_sample(docs, "doc_id", "n_chars", 50, seed="w9").collect()
    )
    assert s1 != s3


def test_weighted_sample_respects_weights(spark):
    from batchprocessingetl_spark.operators.sampling import weighted_sample

    # 10 heavy rows (weight 1000) among 200 light rows (weight 1):
    # heavy mass = 10000/10200 ≈ 98%, so a draw of 10 should be mostly
    # heavy under ANY seed; count across 20 seeds to kill flake risk
    rows = [(i, 1000.0 if i < 10 else 1.0) for i in range(210)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy = 0
    for s in range(20):
        picked = weighted_sample(df, "id", "w", 10, seed=f"s{s}").collect()
        heavy += sum(1 for r in picked if r["id"] < 10)
    # expectation ~= 9.5/draw; even a loose bound separates it from
    # uniform sampling (expectation 0.47/draw)
    assert heavy >= 120


def test_weighted_sample_excludes_nonpositive_and_plans_topk(spark):
    from batchprocessingetl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0), (4, 5.0)], "id long, w double"
    )
    out = weighted_sample(df, "id", "w", 10)
    assert sorted(r["id"] for r in out.collect()) == [3, 4]
    # global top-k must plan as TakeOrderedAndProject (per-partition
    # heaps), never a full global sort of the corpus
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_temperature_resample_reweights_toward_tail(spark):
    # alpha=0 equalizes strata; alpha=1 preserves natural proportions
    from batchprocessingetl_spark.operators.sampling import temperature_resample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, src string")

    eq = temperature_resample(df, "src", "id", alpha=0.0, target_rows=200)
    by = {r["src"]: r["n"] for r in eq.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # alpha=0: each stratum targets ~100 (small stratum keeps all 100)
    assert by["small"] == 100
    assert 60 <= by["big"] <= 140

    nat = temperature_resample(df, "src", "id", alpha=1.0, target_rows=200)
    byn = {r["src"]: r["n"] for r in nat.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # alpha=1: proportional (~180 vs ~20)
    assert byn["big"] > 4 * byn.get("small", 1)


def test_temperature_resample_deterministic_and_layout_independent(spark):
    from batchprocessingetl_spark.operators.sampling import temperature_resample

    rows = [(i, f"s{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, src string")
    a = sorted(r["id"] for r in temperature_resample(df, "src", "id", 0.5, 100).collect())
    b = sorted(
        r["id"]
        for r in temperature_resample(df.repartition(13), "src", "id", 0.5, 100).collect()
    )
    assert a == b and len(a) > 0


def test_negative_pairs_match_python_replay(spark):
    """negative_pairs must equal a driver-side replay of the identical
    md5 draws (reps per (bucket, group), min-pos non-same-group rep per
    draw) — and never serve a same-group row as a negative."""
    import hashlib

    from batchprocessingetl_spark.operators.sampling import negative_pairs

    rows = [(i, f"src_{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        (r["anchor"], r["draw"]): (r["anchor_grp"], r["negative"])
        for r in negative_pairs(
            df, "doc_id", "source", k=3, n_buckets=8, seed="t"
        ).collect()
    }

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    base = [(k, g, h(f"tp:{k}"), h(f"tb:{k}") % 8) for k, g in rows]
    reps: dict[tuple[int, str], tuple[int, int]] = {}
    for k, g, pos, bkt in base:
        cur = reps.get((bkt, g))
        if cur is None or (pos, k) < cur:
            reps[(bkt, g)] = (pos, k)
    want = {}
    for k, g, _, _ in base:
        for i in range(1, 4):
            tb = h(f"tt:{k}:{i}") % 8
            cands = [v for (bk, gg), v in reps.items() if bk == tb and gg != g]
            if cands:
                want[(k, i)] = (g, min(cands)[1])
    assert got == want
    for (k, _), (g, neg) in got.items():
        assert rows[neg][1] != g


def test_quota_allocation_matches_python_replay(spark):
    """q151's largest-remainder allocation must equal a driver-side
    replay: floor quotas, leftover seats to largest (B*n_i) mod N
    remainders (ties by source), fill by md5 rank — and the sample
    total must be EXACTLY the budget."""
    import hashlib

    from batchprocessingetl_spark.workload.curation_queries import (
        QUOTA_BUDGET,
        QUOTA_SEED,
        q151_quota_allocation_sample,
    )
    from tests.conftest import SF_SMOKE

    got = [
        (r["doc_id"], r["source"], r["quota"])
        for r in q151_quota_allocation_sample(spark, SF_SMOKE).collect()
    ]
    assert len(got) == QUOTA_BUDGET

    docs = [
        (r["doc_id"], r["source"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    ]
    counts: dict[str, int] = {}
    for _, src in docs:
        counts[src] = counts.get(src, 0) + 1
    n = sum(counts.values())
    floor_q = {s: (QUOTA_BUDGET * c) // n for s, c in counts.items()}
    rem = {s: (QUOTA_BUDGET * c) % n for s, c in counts.items()}
    extras = QUOTA_BUDGET - sum(floor_q.values())
    order = sorted(counts, key=lambda s: (-rem[s], s))
    quota = {
        s: floor_q[s] + (1 if i < extras else 0) for i, s in enumerate(order)
    }
    want = []
    by_src: dict[str, list] = {}
    for did, src in docs:
        h = hashlib.md5(f"{QUOTA_SEED}:{did}".encode()).hexdigest()
        by_src.setdefault(src, []).append((h, did))
    for src, rows in by_src.items():
        for _, did in sorted(rows)[: quota[src]]:
            want.append((did, src, quota[src]))
    assert sorted(got) == sorted(want)
