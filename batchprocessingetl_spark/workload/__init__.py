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
)

# Round-7 rotation (VERDICT r6 #1): the 50 driver-checked rows.
# Newly rotated IN (40): the TPC-H analog completions q164-q168/
# q174-q177/q186 (with round 6's q127-q134 these finish driver
# coverage of all 22 TPC-H shapes), the fixed-point iterative family
# q182/q185/q187/q190/q220, the experimentation shelf q206/q232-q240,
# the KMV sketch pair q203/q204 (VERDICT r6 #5), and thirteen
# family-retaining rows q178/q188/q192/q195/q196/q198/q207/q208/
# q214/q216/q221/q225/q228. Anchors kept (10): q03/q40/q41/q60/q71/
# q78/q93/q111 (no incoming sibling) plus q146 (interval-join
# attribution — sole registered interval row) and q147 (BM25 lexical
# retrieval — sole registered BM25 row). Displacement mapping lives in
# docs/COVERAGE.md ("Round 7 rotation").
_REGISTERED = (
    # TPC-H analog completions (Q2, Q4, Q9, Q10, Q16, Q6, Q12, Q14, Q20, Q13)
    "q164_min_cost_supplier",
    "q165_late_shipment_priority",
    "q166_nation_profit",
    "q167_returned_item_customers",
    "q168_dominant_suppliers",
    "q174_forecast_revenue_delta",
    "q175_shipping_speed_priority",
    "q176_promo_revenue_share",
    "q177_part_supplier_counts",
    "q186_customer_order_distribution",
    # fixed-point iterative family
    "q182_bpe_train_merges",
    "q185_markov_stationary",
    "q187_kmeans_clusters",
    "q190_trade_reach_bfs",
    "q220_pca_power_iteration",
    # experimentation / statistics shelf
    "q206_permutation_test",
    "q232_spearman_corr",
    "q233_kruskal_wallis",
    "q234_cuped_adjustment",
    "q235_diff_in_diff",
    "q236_trimmed_mean",
    "q237_ab_power_mde",
    "q238_friedman_test",
    "q239_cochran_armitage",
    "q240_mcnemar_classifiers",
    # KMV sketches (VERDICT r6 #5 — streaming twin's batch anchor)
    "q203_kmv_distinct",
    "q204_kmv_rolling_wau",
    # family-retaining rows for the displaced q123-q163 set
    "q178_join_size_estimate",
    "q188_dsir_importance_select",
    "q192_mmr_rerank",
    "q195_dominant_frequency",
    "q196_mad_outliers",
    "q198_weighted_jaccard_pairs",
    "q207_stratified_kfold",
    "q208_acf_daily_revenue",
    "q214_js_divergence",
    "q216_zipf_slope",
    "q221_itemitem_cf",
    "q225_blocking_quality",
    "q228_next_event_accuracy",
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
