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
    round12_queries as _round12,
    round13_queries as _round13,
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
    _round12,
    _round13,
)

# Round-13 rotation (VERDICT r12 #1, executed exactly as the
# docs/COVERAGE.md rotation ledger schedules it). Newly rotated IN
# (41): the final 26 never-checked rows — after this round EVERY
# query declared through round 10 has >=1 driver CORRECTNESS row —
# q38 (now full-value-oracled via the md5 simhash, VERDICT r12 #3),
# q51, q56, q61 (rows-only by design: streaming), q173, q181, q184,
# q189, q193, q201, q202, q205, q210-q213, q215, q217-q219, q222,
# q223, q226, q227, q230, q231 — plus the complete round-11
# embedding-diagnostics/time-series shelf q332-q344 (13) and the
# head of the round-12 shelf (q345 AMS F2, q346 ANN recall audit).
# Displaced to EXTRA (41): the 26 round-12 first-proof rows
# (q291-q301, q191, q183, q194, q197, q224, q169-q172, q179/q180,
# q199/q200, q209, q229), the 14 q302-q331 second-proof retainers
# (now twice-proven), and q187 (thrice-proven clustering retainer).
# The 9 standing anchors stay. q347-q368 fill round 14 alongside
# the second proofs the ledger schedules there.
_REGISTERED = (
    # final never-checked rows — first driver proof (26)
    "q38_simhash_signatures",
    "q51_label_centroid_similarity",
    "q56_knn_int8",
    "q61_streaming_hourly",
    "q173_embedding_covariance",
    "q181_ngram_novelty",
    "q184_pmi_collocations",
    "q189_triplet_mining",
    "q193_theil_sen_trend",
    "q201_span_corruption",
    "q202_batch_padding_efficiency",
    "q205_cohens_kappa",
    "q210_target_encoding",
    "q211_woe_iv",
    "q212_average_precision",
    "q213_decision_stump",
    "q215_quantile_normalization",
    "q217_adamic_adar",
    "q218_oof_target_encoding",
    "q219_group_moments",
    "q222_feature_hash_audit",
    "q223_conformal_coverage",
    "q226_benford_audit",
    "q227_naive_bayes_langid",
    "q230_fk_integrity",
    "q231_cross_source_overlap",
    # round-11 shelf — first driver proof (13)
    "q332_knn_shapley",
    "q333_mmd_quadratic",
    "q334_energy_distance",
    "q335_knn_label_noise",
    "q336_davies_bouldin",
    "q337_silhouette_centroid",
    "q338_twonn_intrinsic_dim",
    "q339_seasonality_scan",
    "q340_t_closeness",
    "q341_hurst_rs",
    "q342_zipf_fit",
    "q343_heaps_law",
    "q344_overdispersion",
    # round-12 shelf head — first driver proof (2)
    "q345_ams_f2_sketch",
    "q346_ann_recall_audit",
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
