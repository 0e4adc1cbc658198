"""Query workload registry.

Each submodule contributes ``QUERIES`` (name -> callable(spark, sf_dir)
-> DataFrame) and ``ORACLE`` (name -> equivalent ANSI SQL for DuckDB).
``collect_queries()`` / ``collect_oracle()`` merge them for
``__spark_entry__.py``. Names are prefixed to group by area.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batchprocessingetl_spark.workload import (
    curation_queries as _curation,
    events as _events,
    mm_stream as _mm_stream,
    pipeline_queries as _pipeline,
    relational as _relational,
    stats_queries as _stats,
    textops as _textops,
    vectors as _vectors,
)

# Registration order = the driver's CORRECTNESS check order (round 1
# stopped at exactly 50 entries, in insertion order). The registry is
# trimmed to 50 entries total; the families that went unchecked in
# round 1 (vectors, multimodal, advanced text) register early so a
# time-capped run still reaches them, followed by the round-2 curation
# family (q67-q70).
_MODULES = (
    _relational,
    _vectors,
    _mm_stream,
    _curation,
    _pipeline,
    _events,
    _textops,
    _stats,
)


def collect_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def collect_oracle() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLE", {}))
    return out


def collect_extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries kept out of the driver registry (its CORRECTNESS run
    checks ~50 entries/round) but still first-class, pytest-run surface."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "EXTRA_QUERIES", {}))
    return out


def collect_extra_oracle() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "EXTRA_ORACLE", {}))
    return out
