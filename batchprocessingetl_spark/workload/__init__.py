"""Query workload registry.

Each submodule contributes ``QUERIES`` / ``EXTRA_QUERIES`` (name ->
callable(spark, sf_dir) -> DataFrame) and ``ORACLE`` / ``EXTRA_ORACLE``
(name -> equivalent ANSI SQL for DuckDB). The driver's CORRECTNESS run
checks exactly the ~50 entries returned by ``collect_queries()``; the
remaining declared surface stays first-class via
``collect_extra_queries()`` (pytest + tools/check_oracle.py --extra).

Since round 7 the registered/EXTRA split is decided HERE by the
``_REGISTERED`` tuple (insertion order = the driver's check order),
not by which per-module dict a query happens to live in — a rotation
is now a one-line edit per query, and the per-module dicts only need
to be duplicate-free. docs/COVERAGE.md records each round's rotation
and the retained registered evidence per displaced family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batchprocessingetl_spark.workload import (
    curation_queries as _curation,
    events as _events,
    inference_queries as _inference,
    mm_stream as _mm_stream,
    pipeline_queries as _pipeline,
    relational as _relational,
    stats_queries as _stats,
    textops as _textops,
    vectors as _vectors,
)

_MODULES = (
    _relational,
    _vectors,
    _mm_stream,
    _curation,
    _pipeline,
    _events,
    _textops,
    _stats,
    _inference,
)

# Round-9 rotation (VERDICT r8 #1): the 50 driver-checked rows.
# Newly rotated IN (13): the whole round-8 block q268-q280 — KMV set
# algebra, RANSAC, AQP Horvitz-Thompson, IPF raking, Merkle shard
# audit + descent, CUBE lattice, Kneser-Ney, greedy set-cover,
# relational division, PQ codebooks, FK scorecard, column profiler —
# the only declared rows that lacked a driver CORRECTNESS entry.
# Displaced to EXTRA (13), each driver-proven in round 8 and with
# registered kin: survival/testing q244/q247/q258 (q245 stratified
# effect + q257 log-rank stay, with q234/q236/q240), graph fixed
# points q241/q261 (q190 BFS + q251 LPA stay), attribution q250
# (q146/q242/q267 stay), and the analytics singletons q243/q246/
# q248/q249/q255/q260/q264 whose families retain anchors (q111 IVM,
# q253 k-center, q208 ACF, q147 RRF, incoming q270 estimation and
# q279/q280 data-quality). Mapping in docs/COVERAGE.md "Round 9
# rotation".
_REGISTERED = (
    # round-8 block, rotated in (13)
    "q268_kmv_set_ops",
    "q269_ransac_line",
    "q270_aqp_sample_estimate",
    "q271_ipf_raking",
    "q272_merkle_shard_audit",
    "q273_cube_revenue",
    "q274_kneser_ney",
    "q275_setcover_selection",
    "q276_relational_division",
    "q277_merkle_diff_localization",
    "q278_product_quantization",
    "q279_fk_integrity_audit",
    "q280_column_profile",
    # round-9/10 block, rotated in (10)
    "q281_stochastic_setcover",
    "q282_kendall_tau",
    "q283_benford_audit",
    "q284_spearman_rho",
    "q285_isotonic_regression",
    "q286_decision_stump",
    "q287_theil_sen",
    "q288_mann_whitney_u",
    "q289_cramers_v_matrix",
    "q290_mahalanobis_outliers",
    # round-7 block retainers (4)
    "q253_kcenter_coreset",
    "q256_consistent_hash_rebalance",
    "q257_logrank_test",
    "q267_time_decay_attribution",
    # fixed-point iterative retainers
    "q182_bpe_train_merges",
    "q187_kmeans_clusters",
    "q190_trade_reach_bfs",
    "q220_pca_power_iteration",
    # experimentation representatives
    "q234_cuped_adjustment",
    "q236_trimmed_mean",
    "q240_mcnemar_classifiers",
    # KMV sketches (streaming twin's batch anchor)
    "q203_kmv_distinct",
    "q204_kmv_rolling_wau",
    # family retainers
    "q188_dsir_importance_select",
    "q192_mmr_rerank",
    "q208_acf_daily_revenue",
    "q225_blocking_quality",
    # anchors
    "q03_product_sales_in_year",
    "q40_staging_clean",
    "q41_scd2_demo",
    "q60_multimodal_features",
    "q71_sequence_packing",
    "q78_unpivot_metrics",
    "q93_merge_upsert",
    "q111_ivm_nation_revenue",
    "q146_multitouch_attribution",
    "q147_hybrid_retrieval_rrf",
)


def _merged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for dct in (mod.QUERIES, getattr(mod, "EXTRA_QUERIES", {})):
            overlap = set(out) & set(dct)
            if overlap:
                raise ValueError(f"duplicate query names: {overlap}")
            out.update(dct)
    return out


def _merged_oracle() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLE", {}))
        out.update(getattr(mod, "EXTRA_ORACLE", {}))
    return out


def collect_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-registered rows, in check order (see _REGISTERED)."""
    merged = _merged_queries()
    missing = [n for n in _REGISTERED if n not in merged]
    if missing:
        raise ValueError(f"_REGISTERED names not defined anywhere: {missing}")
    return {name: merged[name] for name in _REGISTERED}


def collect_oracle() -> dict[str, str]:
    oracles = _merged_oracle()
    return {n: oracles[n] for n in _REGISTERED if n in oracles}


def collect_extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries kept out of the driver registry (its CORRECTNESS run
    checks ~50 entries/round) but still first-class, pytest-run surface."""
    registered = set(_REGISTERED)
    return {n: fn for n, fn in _merged_queries().items() if n not in registered}


def collect_extra_oracle() -> dict[str, str]:
    registered = set(_REGISTERED)
    return {n: sql for n, sql in _merged_oracle().items() if n not in registered}
