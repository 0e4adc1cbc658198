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
)

# Round-12 rotation (VERDICT r11 #2, executed exactly as the
# docs/COVERAGE.md rotation ledger schedules it). Newly rotated IN
# (26): the never-checked q291-q301 rank/survival shelf (11) plus the
# 15 family-restoring / oldest EXTRA-only rows the ledger names —
# q191 Merkle diff (infra-audit), q183 BPE-apply + q194 fertility
# (LM training), q197 HLL overlap (sketches), q224 k-anonymity
# (record linkage), q169-q172 (drift/testing), q179/q180 (retrieval
# eval), q199/q200 (datacard/funnel), q209 CUSUM, q229 mutual
# information. Displaced to EXTRA (26): q281-q290 (twice-proven
# r10+r11) and 16 once-proven rows of the q302-q331 shelf (the
# ledger accepts one-proof rotation for rows displaced BY
# never-checked rows; their second proof lands r14). Retained from
# q302-q331 for a second driver proof (14): the 13 queries VERDICT
# r10 named by name plus q315 (agreement family retainer).
_REGISTERED = (
    # never-checked q291-q301 shelf — first driver proof (11)
    "q291_cochran_armitage",
    "q292_brown_forsythe",
    "q293_kaplan_meier",
    "q294_runs_test",
    "q295_jonckheere_terpstra",
    "q296_friedman_test",
    "q297_mantel_haenszel",
    "q298_kruskal_wallis",
    "q299_cohens_kappa",
    "q300_pages_trend",
    "q301_theils_u",
    # never-checked family-restoring EXTRA rows (15)
    "q191_merkle_diff",
    "q183_bpe_apply_compression",
    "q194_tokenizer_fertility",
    "q197_audience_overlap_hll",
    "q224_k_anonymity_audit",
    "q169_priority_auc",
    "q170_chisq_independence",
    "q171_psi_price_drift",
    "q172_ks_two_sample",
    "q179_retrieval_ndcg",
    "q180_score_calibration",
    "q199_corpus_datacard",
    "q200_curation_funnel",
    "q209_cusum_changepoint",
    "q229_mutual_information",
    # q302-q331 retainers, second driver proof (14)
    "q302_logrank_test",
    "q304_wasserstein_daily_revenue",
    "q308_hodges_lehmann",
    "q312_matryoshka_rerank",
    "q313_binary_hamming_rerank",
    "q315_agreement_family",
    "q318_markov_entropy_rate",
    "q319_modularity_score",
    "q320_jarque_bera",
    "q322_anderson_darling_2s",
    "q325_cooks_distance",
    "q328_page_hinkley",
    "q329_dickey_fuller",
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
