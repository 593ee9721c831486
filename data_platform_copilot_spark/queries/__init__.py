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
    # flagship (also the driver's entry() smoke query)
    "flagship_revenue_by_nation",
    # dedup family
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_semantic",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_keeper_selection",
    "dedup_spans",
    # similarity / embeddings
    "ann_bruteforce_topk",
    "ann_srp_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    # sampling
    "deterministic_hash_sample",
    "stratified_sample_counts",
    "domain_mix_sample_counts",
    "temperature_mix_counts",
    # quality / text-pipeline
    "text_token_stats",
    "text_quality_score",
    "text_repetition_signals",
    "doc_chunking",
    "chunk_packing",
    "pii_redaction",
    "quality_filter_gopher",
    "decontamination",
    # data selection (new in r5)
    "dsir_importance_resample",
    "unigram_logprob_score",
    # multimodal
    "multimodal_features",
    # event-time / streaming-parity
    "sessionization_gaps",
    "tumbling_window_1h",
    "hopping_window_15m",
    "events_gap_fill",
    "asof_join_purchase_click",
    "range_join_price_bands",
    # warehouse views (catalog surface)
    "warehouse_view_revenue",
    # SQL-surface extras promoted from past the r2 gate window
    "argmax_aggregates",
    "group_by_all_syntax",
    # r5 additions: retrieval, fuzzy decontamination, snapshot diff,
    # rolling anomaly, data card, per-group reservoir
    "bm25_topk_docs",
    "decontamination_fuzzy",
    "snapshot_diff_documents",
    "rolling_zscore_anomalies",
    "corpus_datacard_by_lang",
    "per_group_reservoir_sample",
    # bench headliners + reference DQ/gateway parity
    "multi_join_topk",
    "cohort_retention_weekly",
    "tpch_q1_pricing_summary",
    "window_rank_topk_per_group",
    "dq_profile_events_value",
    "dq_rule_freshness_ts",
    # Rotation policy: every registry entry should earn a driver-green
    # row at least once across rounds. r5 rotates OUT twelve slots
    # that were driver-verified in r2-r4 (dedup_exact, dedup_simhash,
    # text_fingerprint, embedding_quantize_int8, text_lang_id,
    # text_ngram_frequency, window_range_frame,
    # window_distribution_funcs, set_ops_all_variants, array_functions,
    # null_ordering, lateral_view_explode — all still value-verified
    # every run by the full-registry pytest oracle at sf0.01 AND the
    # slow sf0.1 suite) in favor of the entries never yet inside the
    # gate: the r3/r4 additions ann_pq_topk / hopping_window_15m /
    # events_gap_fill, the r5-fixed dq_rule_freshness_ts, and the
    # eight r5-new operators. List is exactly 50 names.
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
