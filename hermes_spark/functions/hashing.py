"""Portable hashing expressions for dedup / similarity operators.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen — no Python UDFs; see SURVEY.md §2.9 for why the engine stays
expression-based).

``portable_hash64`` is an md5-derived 60-bit hash chosen because the exact
same value is computable in ANSI-ish SQL on other engines, which makes
minhash/simhash operators oracle-checkable:

* Spark:  ``CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)``
* DuckDB: ``('0x' || substring(md5(x), 1, 15))::BIGINT``

It is NOT a cryptographic or even particularly fast hash — at 100 TB you
would switch ``hash_expr`` to ``xxhash64`` (one JVM intrinsic instead of
md5+conv); the md5 variant exists so correctness can be verified
engine-to-engine.  Both are exposed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    """60-bit integer hash reproducible in DuckDB (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fast_hash64(col: Column, seed: int = 42) -> Column:
    """xxhash64 — the production hash for 100 TB runs (not oracle-portable)."""
    return F.xxhash64(col, F.lit(seed))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams of a string as ``array<string>``.

    Strings shorter than ``n`` yield a single shingle (the whole string),
    so every non-null document has a non-empty shingle set.
    """
    shorter = F.array(F.substring(col, 1, n))
    full = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(col) - (n - 1)),
            lambda i: col.substr(i, F.lit(n)),
        )
    )
    return F.when(F.length(col) <= n, shorter).otherwise(full)


def minhash_signature(
    shingle_col: Column, num_hashes: int = 16, portable: bool = True, seed: int = 42
) -> Column:
    """MinHash signature ``array<bigint>`` of a shingle array.

    Component ``i`` is ``min over shingles of hash(i || ':' || shingle)`` —
    the classic per-permutation minimum (Broder '97), with the permutation
    family realized as seeded hashes.
    """
    hasher = (
        (lambda c: portable_hash64(c)) if portable else (lambda c: fast_hash64(c, seed))
    )

    def component(i: int):
        prefix = f"{i}:"
        # NOTE: the lambda must take exactly ONE argument — PySpark passes
        # the array index to a second parameter, which would clobber a
        # seed captured via default-arg.
        return F.array_min(
            F.transform(shingle_col, lambda s: hasher(F.concat(F.lit(prefix), s)))
        )

    return F.array(*[component(i) for i in range(num_hashes)])


def band_keys(
    signature_col: Column, num_bands: int, rows_per_band: int, portable: bool = True
) -> Column:
    """LSH banding: ``array<string>`` of ``num_bands`` bucket keys.

    Band ``b`` hashes signature components ``[b*r, (b+1)*r)``; two
    documents land in the same bucket for band ``b`` iff those components
    are identical (the standard banding construction — probability of
    sharing a bucket is ``1-(1-j^r)^b`` for Jaccard ``j``).
    """
    keys = []
    for b in range(num_bands):
        parts = [
            signature_col.getItem(b * rows_per_band + r).cast("string")
            for r in range(rows_per_band)
        ]
        keys.append(F.concat_ws("_", F.lit(str(b)), *parts))
    return F.array(*keys)
