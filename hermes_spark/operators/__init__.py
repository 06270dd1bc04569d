from .cdc import latest_by_key, scd2_history, scd2_lookup
from .dedup import (
    banded_match_pairs,
    blocking_key_pairs,
    dedup_against,
    connected_components,
    connected_components_star,
    duplicate_clusters,
    exact_dedup,
    fuzzy_dedup_keep_one,
    linkage_scores,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
    source_overlap,
)
from .funnel import cohort_retention, funnel_counts
from .graph import degree_stats, pagerank
from .asof import asof_join
from .boilerplate import boilerplate_lines, strip_boilerplate_lines
from .gapfill import ewma_smooth, gapfill_rollup, rolling_anomalies
from .joins import range_join, read_bucketed, salted_join, write_bucketed
from .multimodal import (
    decode_image_stub,
    extract_audio_features,
    extract_image_features,
    frame_sample,
    with_media_metadata,
)
from .profile import (
    approx_column_profile,
    column_profile,
    histogram,
    skew_report,
    winsorize,
    zorder_key,
)
from .similarity import cross_near_dup_pairs, hard_negatives, semantic_decontaminate
from .sampling import (
    deterministic_sample,
    mix_corpora,
    rebalance_mix,
    sample_per_group,
    split_assign,
    stratified_sample,
    temperature_mix,
)
from .embedprep import embedding_dim_profile, standardize_embeddings
from .entropy import entropy_profile, unit_entropy
from .expectations import Rule, check_expectations
from .ngrams import ngram_novelty, pmi_collocations, topk_ngrams
from .classify import linear_quality_score, quality_features
from .projection import random_project, sign_matrix
from .importance import bucket_distribution, dsir_weights, token_buckets
from .mmr import mmr_rerank_pandas, mmr_select
from .spans import duplicate_spans, gram_positions, span_dedup_stats
from .quantize import (
    ivf_sq8_rescore_topk,
    ivf_sq8_topk,
    pq_encode,
    pq_topk,
    pq_train,
    sq8_quantize,
    sq8_stats,
    sq8_topk,
)
from .sessionize import sessionize
from .tfidf import (
    bigram_logprob,
    hashing_vectorize,
    tfidf_topk_terms,
    unigram_logprob,
    vocab_stats,
)
from .packing import length_curriculum, pack_sequences, packed_sequence_stats, token_chunks
from .passages import (
    decontaminate,
    duplicate_passage_stats,
    passage_chunks,
    passage_hashes,
)
from .winnow import winnow_fingerprints, winnow_near_dup_pairs
from .similarity import (
    brute_force_cosine_topk,
    brute_force_cosine_topk_pandas,
    embedding_near_dup_pairs,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
    lsh_cosine_topk,
    semantic_dedup,
)
from .tfidf import bm25_scores

__all__ = [
    "asof_join",
    "banded_match_pairs",
    "dedup_against",
    "bm25_scores",
    "cohort_retention",
    "degree_stats",
    "ewma_smooth",
    "funnel_counts",
    "pagerank",
    "latest_by_key",
    "length_curriculum",
    "linkage_scores",
    "rolling_anomalies",
    "sample_per_group",
    "scd2_history",
    "semantic_dedup",
    "source_overlap",
    "split_assign",
    "boilerplate_lines",
    "strip_boilerplate_lines",
    "connected_components",
    "connected_components_star",
    "gapfill_rollup",
    "exact_dedup",
    "duplicate_clusters",
    "fuzzy_dedup_keep_one",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "tfidf_topk_terms",
    "unigram_logprob",
    "vocab_stats",
    "bigram_logprob",
    "hashing_vectorize",
    "blocking_key_pairs",
    "simhash_near_dup_pairs",
    "brute_force_cosine_topk",
    "brute_force_cosine_topk_pandas",
    "embedding_near_dup_pairs",
    "ivf_assign",
    "ivf_topk",
    "kmeans_centroids",
    "lsh_cosine_topk",
    "column_profile",
    "skew_report",
    "histogram",
    "approx_column_profile",
    "zorder_key",
    "winsorize",
    "sessionize",
    "deterministic_sample",
    "mix_corpora",
    "stratified_sample",
    "salted_join",
    "range_join",
    "write_bucketed",
    "read_bucketed",
    "decode_image_stub",
    "extract_audio_features",
    "extract_image_features",
    "frame_sample",
    "with_media_metadata",
    "winnow_fingerprints",
    "winnow_near_dup_pairs",
    "passage_chunks",
    "passage_hashes",
    "duplicate_passage_stats",
    "decontaminate",
    "token_chunks",
    "pack_sequences",
    "packed_sequence_stats",
    "rebalance_mix",
    "unit_entropy",
    "entropy_profile",
    "sq8_stats",
    "sq8_quantize",
    "sq8_topk",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivf_sq8_topk",
    "ivf_sq8_rescore_topk",
    "topk_ngrams",
    "ngram_novelty",
    "pmi_collocations",
    "scd2_lookup",
    "Rule",
    "check_expectations",
    "embedding_dim_profile",
    "standardize_embeddings",
    "linear_quality_score",
    "quality_features",
    "random_project",
    "sign_matrix",
    "dsir_weights",
    "bucket_distribution",
    "token_buckets",
    "mmr_select",
    "mmr_rerank_pandas",
    "temperature_mix",
    "cross_near_dup_pairs",
    "semantic_decontaminate",
    "hard_negatives",
    "duplicate_spans",
    "gram_positions",
    "span_dedup_stats",
]
