from .hashing import band_keys, minhash_signature, portable_hash64, shingles
from .text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)

__all__ = [
    "portable_hash64",
    "shingles",
    "minhash_signature",
    "band_keys",
    "tokens",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
]
