from .dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from .similarity import brute_force_topk, srp_lsh_topk

__all__ = [
    "brute_force_topk",
    "embedding_near_duplicates",
    "exact_duplicates",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "shingles",
    "simhash",
    "srp_lsh_topk",
]
