from .dedup import (
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from .similarity import brute_force_cosine_topk, ivf_assign, lsh_cosine_topk

__all__ = [
    "exact_dedup",
    "duplicate_clusters",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "brute_force_cosine_topk",
    "ivf_assign",
    "lsh_cosine_topk",
]
