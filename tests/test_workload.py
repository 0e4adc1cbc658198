"""Smoke: every registered query runs at sf0.001 and each oracle key
has a matching query. (Value-level parity is the driver's DuckDB gate;
tools/check_oracle.py runs it locally.)"""

from __future__ import annotations

import pytest

from batchprocessingetl_spark.workload import collect_oracle, collect_queries
from tests.conftest import SF_SMOKE

QUERIES = collect_queries()


def test_oracle_keys_subset_of_queries():
    assert set(collect_oracle()) <= set(QUERIES)


def test_registry_nonempty_and_named():
    assert len(QUERIES) >= 30
    assert all(name.startswith("q") for name in QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_approx_distinct_within_error_bound(spark):
    rows = QUERIES["q57_approx_distinct"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / max(r["exact_parts"], 1)
        assert rel_err <= 0.05, (r["l_returnflag"], r["approx_parts"], r["exact_parts"])


def test_int8_knn_equals_exact_knn(spark):
    exact = QUERIES["q50_knn_bruteforce"](spark, SF_SMOKE).collect()
    quant = QUERIES["q56_knn_int8"](spark, SF_SMOKE).collect()
    assert [r.asDict() for r in quant] == [r.asDict() for r in exact]


def test_quantize_int8_roundtrip_accuracy(spark):
    import math

    from batchprocessingetl_spark.catalog import load_table
    from batchprocessingetl_spark.operators.similarity import quantize_int8

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(50)
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    q = {r["vec_id"]: (r["qvec"], r["qscale"]) for r in quantize_int8(emb).collect()}
    assert set(q) == set(orig)
    for vid, vec in orig.items():
        qvec, scale = q[vid]
        assert all(-127 <= b <= 127 for b in qvec)
        # cosine(orig, dequantized) stays near 1 — rank-preserving noise
        deq = [b * scale for b in qvec]
        dp = sum(a * b for a, b in zip(vec, deq))
        na = math.sqrt(sum(a * a for a in vec))
        nb = math.sqrt(sum(b * b for b in deq))
        assert dp / (na * nb) > 0.999
