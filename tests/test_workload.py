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
