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


#: Mersenne prime 2^31-1: the permutation modulus. Hash values and the
#: affine coefficients are all < 2^31, so a*h+b < 2^62 never overflows a
#: 64-bit signed integer — required because both Spark (ANSI mode) and
#: DuckDB error on BIGINT overflow rather than wrapping.
MERSENNE31 = 2_147_483_647


def permutation_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic affine-permutation coefficients ``(a_i, b_i)`` shared
    by the Spark expressions and any SQL oracle re-implementation."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(num_hashes)
    ]


def base_hash31(col: Column, portable: bool = True, seed: int = 42) -> Column:
    """31-bit base hash of a string, reduced mod 2^31-1.

    Portable variant (DuckDB: ``('0x' || substring(md5(s), 1, 8))::BIGINT
    % 2147483647``); fast variant uses xxhash64.
    """
    if portable:
        h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    else:
        h = F.abs(F.xxhash64(col, F.lit(seed)))
    return h % F.lit(MERSENNE31)


def minhash_signature_from_hashes(
    hash_col: Column, num_hashes: int = 16, seed: int = 42
) -> Column:
    """MinHash signature ``array<bigint>`` from a base-hash array column.

    Component ``i`` is ``min over shingles of (a_i*h + b_i) mod (2^31-1)``
    — the classic permutation-family minimum (Broder '97). Each shingle is
    hashed ONCE (by :func:`base_hash31`); the per-component work is two
    integer ops, not another string hash. At 16–128 components this is
    what keeps minhashing compute-bound on the cheap path instead of
    md5-bound (the difference is ~10× wall-clock at sf0.1).
    """

    def component(a: int, b: int) -> Column:
        # single-param lambda: PySpark passes the array index to a second
        # parameter, which would clobber values captured via default-args
        return F.array_min(
            F.transform(
                hash_col,
                lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31),
            )
        )

    return F.array(
        *[component(a, b) for a, b in permutation_params(num_hashes, seed)]
    )


def minhash_signature(
    shingle_col: Column, num_hashes: int = 16, portable: bool = True, seed: int = 42
) -> Column:
    """MinHash signature of a shingle array (one-shot expression form).

    Prefer materializing ``base_hash31`` into its own projection first
    (as :func:`hermes_spark.operators.minhash_lsh_pairs` does) so the
    base hashes are provably computed once per row.
    """
    base = F.transform(
        shingle_col, lambda s: base_hash31(s, portable=portable, seed=seed)
    )
    return minhash_signature_from_hashes(base, num_hashes, seed)


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
