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
    # r11 gate. Position 1: approx_percentiles, as ordered by the r10
    # verdict (it was position 51 in the r10 window after the
    # review-caught off-by-one). Position 2: time_travel_as_of, the
    # r11-registered entry (never driver-gated — same slot policy as
    # r10's registered_domain_rollup). Positions 3-50: the
    # LONGEST-rotated entries by last hash-green round, computed from
    # the union of CORRECTNESS_r01..r10 — 47 backfill slots land on
    # last-green-r6 entries (all that remain besides
    # approx_percentiles itself), the final slot on the
    # alphabetically-first last-green-r7 entry (ab_test_mann_whitney;
    # acf_daily_value was displaced to the r12 queue); ties broken
    # alphabetically for determinism.
    # compression_ratio_quality stays parked BELOW position 50
    # permanently: its oracle needs a zlib UDF the driver's vanilla-SQL
    # DuckDB cannot register (r8 artifact burned a slot on
    # `err: no_oracle`); it stays value-gated by queries/core.EXTRA_ORACLE
    # in the local harnesses + a byte-exact pytest. Every name below
    # passes the local full-registry oracle at sf0.001/0.01 and stays
    # value-verified every run by tests/test_queries_oracle.py.
    # ---- ordered first per the r10 verdict ----
    "approx_percentiles",
    # ---- registered r11 (never driver-gated): time travel entry ----
    "time_travel_as_of",
    # ---- backfill 3-50: longest-rotated (last hash-green r6) ----
    "attribution_last_touch",
    "bigram_logprob_score",
    "bootstrap_ci_mean_value",
    "bpe_fertility_by_lang",
    "bpe_merge_table",
    "bpe_segment_lengths",
    "contrastive_triplets",
    "decontamination_embedding",
    "decontamination_substring",
    "dedup_bias_source_mix",
    "dedup_exact",
    "dedup_incremental_minhash",
    "dedup_simhash",
    "dedup_substring_pairs",
    "dedup_winnowing_fingerprints",
    "dq_profile_text_length",
    "dq_rule_anomaly_zscore_value",
    "dq_rule_not_null_user_id",
    "dq_rule_range_value",
    "dq_rule_unique_event_id",
    "dq_top_values_event_type",
    "drift_ks_value",
    "drift_psi_value",
    "embedding_covariance_dims",
    "embedding_quantize_int8",
    "ewma_value_per_user",
    "fim_transform_documents",
    "heavy_hitter_tokens",
    "json_extract_props",
    "json_schema_inference",
    "knn_join_graph",
    "lateral_correlated_topk",
    "lateral_view_explode",
    "pipeline_curation_funnel",
    "pmi_cooccurrence_pairs",
    "privacy_k_anonymity_report",
    "recursive_cte_date_spine",
    "sampler_where_limit",
    "streaming_decontamination_gate",
    "streaming_drift_psi",
    "survival_km_user_lifetime",
    "text_lang_id",
    "tfidf_keywords_per_doc",
    "token_budget_allocation",
    "trend_slope_by_event_type",
    "window_distribution_funcs",
    "zorder_layout_report",
    "ab_test_mann_whitney",
    # ---- gate window ends here (50) ----
    # displaced to the r12 backfill queue by the r11-registered entry:
    "acf_daily_value",
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
