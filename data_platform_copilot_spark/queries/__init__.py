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
    # r10 gate. Positions 1-3: the three r9-registered entries
    # (knn_distance_outliers, url_canonicalization, phash_hamming_pairs)
    # were never driver-gated; the r9 verdict ordered them to lead so
    # every driver-hashable entry (246/247) gets a hash-green row in
    # some CORRECTNESS_r*.json. Positions 4-50: backfill with the
    # LONGEST-rotated entries (last hash-green r5/r6, computed from the
    # union of CORRECTNESS_r01..r09) so the oldest evidence refreshes.
    # compression_ratio_quality stays parked BELOW position 50
    # permanently: its oracle needs a zlib UDF the driver's vanilla-SQL
    # DuckDB cannot register (r8 artifact burned a slot on
    # `err: no_oracle`); it stays value-gated by queries/core.EXTRA_ORACLE
    # in the local harnesses + a byte-exact pytest. Every name below
    # passes the local full-registry oracle at sf0.001/0.01 and stays
    # value-verified every run by tests/test_queries_oracle.py.
    # ---- never-driver-gated (registered r9): 3 entries ----
    "knn_distance_outliers",
    "url_canonicalization",
    "phash_hamming_pairs",
    # ---- registered r10 (never gated): PSL matcher value gate ----
    "registered_domain_rollup",
    # ---- backfill 5-50: longest-rotated driver-green entries ----
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_srp_lsh_topk",
    "argmax_aggregates",
    "asof_join_purchase_click",
    "bm25_topk_docs",
    "chunk_packing",
    "corpus_datacard_by_lang",
    "decontamination",
    "decontamination_fuzzy",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "dedup_keeper_selection",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "dedup_spans",
    "deterministic_hash_sample",
    "doc_chunking",
    "domain_mix_sample_counts",
    "dq_rule_freshness_ts",
    "dsir_importance_resample",
    "events_gap_fill",
    "group_by_all_syntax",
    "hopping_window_15m",
    "multimodal_features",
    "per_group_reservoir_sample",
    "pii_redaction",
    "quality_filter_gopher",
    "range_join_price_bands",
    "rolling_zscore_anomalies",
    "sessionization_gaps",
    "snapshot_diff_documents",
    "stratified_sample_counts",
    "temperature_mix_counts",
    "text_quality_score",
    "text_repetition_signals",
    "text_token_stats",
    "tumbling_window_1h",
    "unigram_logprob_score",
    "warehouse_view_revenue",
    "ab_test_welch_t",
    "approx_distinct_counts",
    # ---- gate window ends here (50) ----
    # approx_percentiles was position 51 after registered_domain_rollup
    # took slot 4 (one slot per never-gated entry, review-caught
    # off-by-one): it falls out of THIS window and leads the r11
    # backfill queue instead.
    "approx_percentiles",
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
