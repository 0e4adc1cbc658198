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

# Round-11 rotation (VERDICT r10 #1/#4): the 50 driver-checked rows.
# Newly rotated IN (30): the ENTIRE q302-q331 shelf — both the
# 13-query first wave VERDICT r10 named (q302 log-rank, q304
# Wasserstein, q308 Hodges-Lehmann, q312 Matryoshka, q313 binary
# Hamming, q318 entropy rate, q319 modularity, q320 Jarque-Bera,
# q322 Anderson-Darling, q325 Cook's distance, q328 Page-Hinkley,
# q329 Dickey-Fuller, q331 KPSS) and the 17-query second wave
# (VERDICT r10 #4), all 3-SF sweep-proven in round 10.
# Displaced to EXTRA (30): the twice-proven (r9+r10) q268-q280 block
# (13) plus 17 multi-round-proven retainers (q78, q182, q188, q190,
# q192, q203, q204, q208, q220, q225, q234, q236, q240, q253, q256,
# q257, q267 — each driver-green in >=2 rounds). Family-retainer
# mapping, the exceptions (LM-training, sketches, infra-audit
# families temporarily all-EXTRA), and the round-12/13 ledger that
# restores them with never-checked rows live in docs/COVERAGE.md
# "Round 11 rotation" + "Rotation ledger".
_REGISTERED = (
    # round-9/10 block, kept for its second driver proof (10)
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
    # round-10 shelf, rotated in — first driver proof (30)
    "q302_logrank_test",
    "q303_ordinal_association",
    "q304_wasserstein_daily_revenue",
    "q305_serial_correlation",
    "q306_anova_oneway",
    "q307_wilcoxon_signed_rank",
    "q308_hodges_lehmann",
    "q309_cochran_q",
    "q310_partial_correlation",
    "q311_chow_break_test",
    "q312_matryoshka_rerank",
    "q313_binary_hamming_rerank",
    "q314_ljung_box",
    "q315_agreement_family",
    "q316_cross_correlation",
    "q317_pacf",
    "q318_markov_entropy_rate",
    "q319_modularity_score",
    "q320_jarque_bera",
    "q321_bhattacharyya",
    "q322_anderson_darling_2s",
    "q323_mood_scale_test",
    "q324_median_test",
    "q325_cooks_distance",
    "q326_breusch_pagan",
    "q327_effect_sizes",
    "q328_page_hinkley",
    "q329_dickey_fuller",
    "q330_turning_points",
    "q331_kpss",
    # clustering family retainer (q253 k-center displaced)
    "q187_kmeans_clusters",
    # anchors
    "q03_product_sales_in_year",
    "q40_staging_clean",
    "q41_scd2_demo",
    "q60_multimodal_features",
    "q71_sequence_packing",
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
