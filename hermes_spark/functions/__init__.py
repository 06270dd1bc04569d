from .hashing import (
    MERSENNE31,
    band_keys,
    base_hash31,
    fast_hash64,
    minhash_signature,
    minhash_signature_from_hashes,
    permutation_params,
    portable_hash64,
    shingles,
)
from .helpers import (
    append_ordinal_suffix,
    calculate_time,
    pretty_print_elapsed_time,
    rich_format,
    timed,
)
from .text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)

__all__ = [
    "MERSENNE31",
    "band_keys",
    "base_hash31",
    "fast_hash64",
    "minhash_signature",
    "minhash_signature_from_hashes",
    "permutation_params",
    "portable_hash64",
    "shingles",
    "append_ordinal_suffix",
    "calculate_time",
    "pretty_print_elapsed_time",
    "rich_format",
    "timed",
    "bpe_token_count",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "token_count",
    "tokens",
]
