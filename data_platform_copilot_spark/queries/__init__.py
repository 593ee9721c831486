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
    # r7 gate: the registry entries that have never had a driver
    # CORRECTNESS row (56 late-r6 additions + everything registered
    # after the r6 gate snapshot; every one passes the local
    # full-registry oracle at sf0.001/0.01/0.1 and stays
    # value-verified every run by the parametrized pytest oracle).
    # The gate window is the first 50; everything after the "gate
    # window ends" marker below is the r8+ residue (54 entries after
    # the extended-r7 additions — clears across r8/r9), listed
    # never-driver-verified strictly first (oldest first) so it
    # leads the r8 gate. The 134 entries with cumulative r1–r6
    # driver greens rotate out entirely this round.
    # -- statistics / DQ family (twins: drift_*, dq_rule_* green r6)
    "mi_event_type_value",
    "dq_benford_first_digit",
    "concentration_gini_user_activity",
    "dq_robust_mean_value",
    "dq_robust_outliers_mad",
    "pareto_share_user_activity",
    "dq_referential_integrity",
    "ab_test_mann_whitney",
    "dispersion_index_by_type",
    "kappa_quality_rules",
    # -- text / tokenization family
    "text_token_entropy",
    "bpe_doc_token_cost",
    "zipf_slope_tokens",
    "text_lang_mixing_flags",
    "sample_vocab_coverage",
    "vocab_coverage_curve",
    "corr_length_alpha_by_lang",
    "packing_efficiency_report",
    # -- embedding / cluster family
    "embedding_mean_pool",
    "cluster_separation_report",
    # -- dedup family
    "dedup_cluster_size_histogram",
    "dedup_pagerank_centrality",
    "dedup_containment_pairs",
    "dedup_minhash_calibration",
    "dedup_threshold_sweep",
    "media_exact_dedup",
    # -- time-series / behavioral family
    "event_transition_matrix",
    "sliding_distinct_users_6h",
    "user_growth_daily",
    "changepoint_cusum_daily",
    "trend_theilsen_daily",
    "forecast_holt_daily",
    "acf_daily_value",
    "audience_overlap_jaccard",
    "ltv_cumulative_by_cohort_week",
    "streaming_trending_types_1h",
    "session_depth_histogram",
    "traffic_heatmap_dow_hour",
    "sax_daily_value",
    "burst_detection_hourly",
    "time_to_convert_view_purchase",
    "pchart_error_rate_hourly",
    "wow_type_movers",
    "churn_label_dataset",
    # -- join / layout / lineage family
    "salted_join_brand_volume",
    "entity_match_part_names",
    "scd2_point_in_time_join",
    # -- sampling family
    "dataset_split_counts",
    "weighted_sample_topk_docs",
    "split_leakage_check",
    # ---- gate window ends here (50) ----
    # r8 residue: never-driver-verified twins of driver-green
    # entries, strictly first in the r8 gate:
    "cohort_retention_matrix",    # twin of cohort_retention_weekly
    "dq_value_histogram",         # twin of dq_top_values_event_type
    "quality_band_filter_counts",  # twin of quality_gopher_filter
    "text_distinctiveness",       # twin of tfidf_keywords_per_doc
    "embedding_stats_by_dim",     # twin of embedding_covariance_dims
    "funnel_view_click_purchase",  # twin of attribution_last_touch
    # Any entry registered during r7 itself queues BEHIND the six
    # names above in the r8 gate (never-driver-verified strictly
    # first, oldest first):
    "multimodal_png_decode",      # r7-new: real PNG codec value gate
    "quality_score_auc",          # r7-new: histogram ROC-AUC
    "dq_winsorized_value_stats",  # r7-new: winsorized robust stats
    "ngram_novelty_deciles",      # r7-new: 13-gram novelty histogram
    "compression_ratio_quality",  # r7-new: zlib signal (oracle-less)
    "unicode_nfc_normalization",  # r7-new: NFC canonicalization gate
    "lang_id_prf_report",         # r7-new: detector P/R/F1 scorecard
    "incremental_agg_maintenance",  # r7-new: mergeable-state rollup
    "streaming_incremental_rollup",  # r7-new: foreachBatch state fold
    "token_budget_epochs_plan",   # r7-new: data-constrained mix plan
    "html_text_extract",          # r7-new: web text extraction
    "corpus_data_card_stats",     # r7-new: grouping-sets data card
    "media_phash_neardup",        # r7-new: aHash image near-dup
    "ccnet_perplexity_buckets",   # r7-new: head/middle/tail terciles
    "output_shard_plan",          # r7-new: token-sized write planning
    "embedding_domain_drift",     # r7-new: centroid-cosine drift
    "ngram_diversity_by_source",  # r7-new: TTR diversity card
    "quality_calibration_bins",   # r7-new: reliability diagram
    "domain_unigram_js",          # r7-new: domain similarity matrix
    "training_order_interleave",  # r7-new: mixture schedule audit
    "doc_length_percentiles_by_source",  # r7-new: exact pctile card
    "dedup_cross_source_matrix",  # r7-new: copy-flow pair matrix
    "dp_laplace_counts",          # r7-new: DP calibration card
    "multimodal_wav_decode",      # r7-new: real WAV codec value gate
    "multimodal_avi_decode",      # r7-new: real AVI codec value gate
    "audio_silence_ratio",        # r7-new: WAV silence QC gate
    "video_scene_changes",        # r7-new: AVI scene-cut QC gate
    "pipeline_media_curation",    # r7-new: media funnel compose
    "decontamination_bloom_prefilter",  # r7-new: value-gated Bloom
    "full_outer_join_reconciliation",   # r7-new: FULL OUTER surface
    "ann_recall_report",          # r7-new: value-gated recall@k audit
    "cms_token_estimates",        # r7-new: value-gated CMS sketch
    "hll_user_cardinality",       # r7-new: value-gated HLL sketch
    "dedup_prefix_filter_pairs",  # r7-new: AllPairs/PPJoin family
    "knn_graph_triangles",        # r7-new: oriented triangle census
    "seasonal_decompose_daily",   # r7-new: MA-trend decomposition
    "privacy_delete_cascade_report",  # r7-new: RTBF cascade dry-run
    "streaming_view_purchase_join",   # r7-new: stream-stream join
    "quantile_histogram_sketch",      # r7-new: mergeable percentiles
    "knn_label_propagation",          # r7-new: semi-supervised LPA
    "padding_waste_batching",         # r7-new: batch padding audit
    "bloom_runtime_filter_join",      # r7-new: runtime-filter star join
    "incremental_join_maintenance",   # r7-new: delta-join IVM
    "range_partition_plan",           # r7-new: sort boundary planner
    "join_size_estimate_cms",         # r7-new: sketch join cardinality
    "streaming_left_outer_attribution",  # r7-new: holdback outer join
    "hll_set_operations",             # r7-new: merged-sketch overlap
    "fd_discovery_report",            # r7-new: FD profiling primitive
    "knn_kcore_peel_profile",         # r7-new: degeneracy cascade
    "zone_map_pruning_audit",         # r7-new: skipping quantified
    "ab_test_cuped_adjusted",         # r7-new: CUPED variance cut
    "conformal_quality_coverage",     # r7-new: split-conformal gate
    "seasonal_adjusted_anomalies",    # r7-new: STL-residual monitor
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
