"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in ``batchprocessingetl_spark/``; this module
is only the binding layer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batchprocessingetl_spark.workload import collect_oracle, collect_queries
from batchprocessingetl_spark.workload.relational import q02_revenue_by_nation_month

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference dashboard Q1 analogue, SURVEY.md §7.1):
    revenue by nation x order month — 4-way join chain + grouped SUM +
    multi-key sort, on /root/testdata/sf0.001."""
    return q02_revenue_by_nation_month(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return collect_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for approximate or
    engine-defined-hash operators -> driver records rows-only checks)."""
    return collect_oracle()
