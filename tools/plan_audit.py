"""Generate docs/PLANS.md: the formatted physical plan of each headline
query at sf0.1, with the scale-relevant plan properties extracted up
front (pushed filters, read schema width, broadcast vs shuffle joins,
exchange count, whole-stage-codegen coverage).

The point (SURVEY.md §4 / README "Scale design"): at 100 TB the plan IS
the performance. This artifact makes plan quality reviewable and
regressions diffable — it is regenerated and committed whenever the
workload changes.

Usage: python tools/plan_audit.py [sf_dir] > docs/PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batchprocessingetl_spark.session import get_spark
from batchprocessingetl_spark.workload import collect_extra_queries, collect_queries

AUDITED = (
    "q01_pricing_summary",
    "q02_revenue_by_nation_month",
    "q05_product_performance",
    "q11_top3_orders_per_customer",
    "q21_sessionization",
    "q37_minhash_near_dups",
    "q47_simhash_near_dups",
    "q50_knn_bruteforce",
    "q56_knn_int8",
    "q53_embedding_similar_pairs",
    "q65_knn_join",
    "q66_semantic_dedup",
    "q67_decontamination",
    "q68_repetition_signals",
    "q69_pii_redaction",
    "q70_bloom_incremental_dedup",
    "q71_sequence_packing",
    "q72_hypertable_rollup",
    "q75_interval_join_concurrency",
    "q77_bm25_topk",
    "q79_medallion_e2e",
    "q80_bm25_query_join",
    "q81_skewed_user_rollup",
    "q82_boilerplate_spans",
    "q83_temperature_resample",
    "q84_strip_boilerplate",
    "q86_vocab_table",
    "q87_cooccurrence",
    "q88_gapfill_locf",
    "q89_fuzzy_name_pairs",
    "q90_constraint_report",
    "q91_rollup_increment",
    "q92_snapshot_diff",
    "q95_lm_quality_score",
    "q96_shard_overlap",
    "q97_nation_trade_pagerank",
    "q99_funnel_conversion",
    "q101_cdc_snapshot",
    "q102_cohort_retention",
    "q103_rate_anomalies",
    "q104_triangle_counts",
    "q105_phrase_search",
    "q106_event_transitions",
    "q107_price_trend_ols",
    "q108_table_profile",
    "q109_dp_daily_counts",
    "q110_copurchase_pairs",
    "q111_ivm_nation_revenue",
    "q112_price_histogram",
    "q113_entity_clusters",
    "q114_active_users",
    "q115_dim_time_travel",
    "q116_source_quality_gate",
    "q117_abc_analysis",
    "q118_leakage_free_split",
    "q119_top_suppliers",
    "q120_idle_customer_balances",
    "q121_heavy_hitters",
    "q122_bootstrap_mean_ci",
    "q123_active_users_hll",
    "q124_incremental_near_dups",
    "q125_knn_ivf_int8",
    "q126_setsim_prefix_join",
    "q127_large_volume_orders",
    "q128_sole_blame_suppliers",
    "q129_important_parts",
    "q130_rolling_revenue_range",
    "q131_small_quantity_revenue",
    "q132_banded_promo_revenue",
    "q133_market_share",
    "q134_nation_pair_volume",
    "q135_containment_near_dups",
    "q136_negative_pairs",
    "q137_vocab_growth",
    "q138_keyness_by_source",
    "q139_audience_overlap",
    "q140_rfm_segments",
    "q141_copurchase_rules",
    "q142_cohort_ltv",
    "q143_interarrival_stats",
    "q144_user_mix_entropy",
    "q145_bitmap_distinct_rollup",
    "q146_multitouch_attribution",
    "q147_hybrid_retrieval_rrf",
    "q148_token_dropout_augment",
    "q149_winsorize_by_source",
    "q150_temporal_embargo_split",
    "q151_quota_allocation_sample",
    "q152_bpe_merge_candidates",
    "q153_top_event_paths",
    "q154_clamped_running_balance",
    "q155_gapfill_interpolate",
    "q156_weighted_median_price",
    "q157_max_drawdown",
    "q158_lang_source_mi",
    "q159_benford_digit_audit",
    "q160_kaplan_meier",
    "q161_ab_test_ztest",
    "q162_revenue_gini",
    "q163_supplier_hhi",
    "q164_min_cost_supplier",
    "q165_late_shipment_priority",
    "q166_nation_profit",
    "q167_returned_item_customers",
    "q168_dominant_suppliers",
    "q169_priority_auc",
    "q170_chisq_independence",
    "q171_psi_price_drift",
    "q172_ks_two_sample",
    "q173_embedding_covariance",
    "q174_forecast_revenue_delta",
    "q175_shipping_speed_priority",
    "q176_promo_revenue_share",
    "q177_part_supplier_counts",
    "q178_join_size_estimate",
    "q179_retrieval_ndcg",
    "q180_score_calibration",
    "q181_ngram_novelty",
    "q184_pmi_collocations",
    "q186_customer_order_distribution",
    "q188_dsir_importance_select",
    "q189_triplet_mining",
    "q191_merkle_diff",
    "q193_theil_sen_trend",
    "q194_tokenizer_fertility",
    "q196_mad_outliers",
    "q197_audience_overlap_hll",
    "q198_weighted_jaccard_pairs",
    "q199_corpus_datacard",
    "q203_kmv_distinct",
    "q204_kmv_rolling_wau",
    "q208_acf_daily_revenue",
    "q210_target_encoding",
    "q213_decision_stump",
    "q215_quantile_normalization",
    "q217_adamic_adar",
    "q218_oof_target_encoding",
    "q220_pca_power_iteration",
    "q221_itemitem_cf",
    "q222_feature_hash_audit",
    "q223_conformal_coverage",
    "q224_k_anonymity_audit",
    "q225_blocking_quality",
    "q226_benford_audit",
    "q227_naive_bayes_langid",
    "q228_next_event_accuracy",
    "q229_mutual_information",
    "q230_fk_integrity",
    "q231_cross_source_overlap",
    "q232_spearman_corr",
    "q233_kruskal_wallis",
    "q234_cuped_adjustment",
    "q235_diff_in_diff",
    "q236_trimmed_mean",
    "q237_ab_power_mde",
    "q238_friedman_test",
    "q239_cochran_armitage",
    "q240_mcnemar_classifiers",
)


def summarize(plan: str) -> list[str]:
    facts = []
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if pushed and any(p.strip() for p in pushed):
        facts.append(f"pushed filters reach the scan: {sum(bool(p.strip()) for p in pushed)}/{len(scans)} scans")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        # count fields by name:type markers (commas inside decimal(p,s)
        # would overcount)
        widths = [s.count(":") for s in schemas if s]
        facts.append(f"column pruning: scan widths {widths} (cols read, not table width)")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    if n_bhj or n_smj:
        facts.append(f"joins: {n_bhj} broadcast-hash, {n_smj} sort-merge")
    n_ex = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
    facts.append(f"exchanges (shuffles): {n_ex}")
    # AQE final plans mark codegen stages with "*(n)" operator prefixes
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
    facts.append(f"whole-stage-codegen spans: {n_wsc}")
    return facts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan_audit")
    # static plans for the audit: AQE off so WholeStageCodegen spans and
    # join choices are visible in toString (at runtime AQE only improves
    # on this picture: skew splitting, partition coalescing, SMJ->BHJ);
    # untruncated metadata so ReadSchema/PushedFilters are parseable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    queries = {**collect_queries(), **collect_extra_queries()}
    print("# Physical-plan audit (generated by tools/plan_audit.py)")
    print()
    print(f"Headline queries at `{sf_dir}` — static physical plans (AQE")
    print("disabled for display only); see the tool docstring.")
    for name in AUDITED:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"\n## {name}\n")
        for f in summarize(plan):
            print(f"- {f}")
        print("\n```")
        print(plan[:4000].rstrip())
        print("```")


if __name__ == "__main__":
    main()
