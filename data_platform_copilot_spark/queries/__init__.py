"""Query-pack registry.

Import every group module for its registration side effects, then
re-export the combined QUERIES / ORACLE dicts. Parity rules for new
entries are documented in ``core.py``'s module docstring.
"""

from .core import (EXTRA_ORACLE, ORACLE, QUERIES, query,  # noqa: F401
                   register_oracle_udfs)

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
    # r12 gate. Position 1: acf_daily_value, as ordered by the r11
    # verdict (displaced from the r11 window by time_travel_as_of).
    # Position 2: schema_evolution_read, the r12-registered entry
    # (never driver-gated — the pinned immediate-slot policy, same as
    # r11's time_travel_as_of). Positions 3-50: the LONGEST-rotated
    # entries by last hash-green round, computed from the union of
    # CORRECTNESS_r01..r11 — the 48 remaining last-green-r7 entries;
    # ties broken alphabetically for determinism. ann_recall_report
    # (alphabetically-first last-green-r8) was displaced to the
    # residue by the r12 registration and leads the r13 backfill.
    # The window deliberately re-gates
    # concentration_gini_user_activity and pareto_share_user_activity
    # — both rewritten this round to the value-histogram method (r11
    # verdict item 3) — so the rewrite carries fresh driver-hash
    # evidence.
    # compression_ratio_quality stays parked BELOW position 50
    # permanently: its oracle needs a zlib UDF the driver's vanilla-SQL
    # DuckDB cannot register (r8 artifact burned a slot on
    # `err: no_oracle`); it stays value-gated by queries/core.EXTRA_ORACLE
    # in the local harnesses + a byte-exact pytest (decision record:
    # ARCHITECTURE.md). Every name below passes the local
    # full-registry oracle at sf0.001/0.01 and stays value-verified
    # every run by tests/test_queries_oracle.py.
    # ---- ordered first per the r11 verdict ----
    "acf_daily_value",
    # ---- registered r12 (never driver-gated): schema evolution ----
    "schema_evolution_read",
    # ---- backfill 3-50: longest-rotated (last hash-green r7) ----
    "audience_overlap_jaccard",
    "bpe_doc_token_cost",
    "burst_detection_hourly",
    "changepoint_cusum_daily",
    "churn_label_dataset",
    "cluster_separation_report",
    "concentration_gini_user_activity",
    "corr_length_alpha_by_lang",
    "dataset_split_counts",
    "dedup_cluster_size_histogram",
    "dedup_containment_pairs",
    "dedup_minhash_calibration",
    "dedup_pagerank_centrality",
    "dedup_threshold_sweep",
    "dispersion_index_by_type",
    "dq_benford_first_digit",
    "dq_referential_integrity",
    "dq_robust_mean_value",
    "dq_robust_outliers_mad",
    "embedding_mean_pool",
    "entity_match_part_names",
    "event_transition_matrix",
    "forecast_holt_daily",
    "kappa_quality_rules",
    "ltv_cumulative_by_cohort_week",
    "media_exact_dedup",
    "mi_event_type_value",
    "packing_efficiency_report",
    "pareto_share_user_activity",
    "pchart_error_rate_hourly",
    "salted_join_brand_volume",
    "sample_vocab_coverage",
    "sax_daily_value",
    "scd2_point_in_time_join",
    "session_depth_histogram",
    "sliding_distinct_users_6h",
    "split_leakage_check",
    "streaming_trending_types_1h",
    "text_lang_mixing_flags",
    "text_token_entropy",
    "time_to_convert_view_purchase",
    "traffic_heatmap_dow_hour",
    "trend_theilsen_daily",
    "user_growth_daily",
    "vocab_coverage_curve",
    "weighted_sample_topk_docs",
    "wow_type_movers",
    "zipf_slope_tokens",
    # ---- gate window ends here (50) ----
    # displaced to the r13 backfill queue by the r12 registration:
    "ann_recall_report",
    # un-hashable by the driver (UDF oracle lives in EXTRA_ORACLE):
    "compression_ratio_quality",
]


def _apply_gate_order() -> None:
    ordered = [k for k in DRIVER_GATE_PRIORITY if k in QUERIES]
    ordered += [k for k in QUERIES if k not in set(ordered)]
    for d in (QUERIES, ORACLE):
        snapshot = dict(d)
        d.clear()
        d.update({k: snapshot[k] for k in ordered if k in snapshot})


_apply_gate_order()

__all__ = ["QUERIES", "ORACLE", "EXTRA_ORACLE", "query",
           "register_oracle_udfs", "DRIVER_GATE_PRIORITY"]
