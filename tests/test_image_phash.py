"""Perceptual image hashing + near-dup pairs (r12c).

The content-level image dedup family: pHash kernel distances on planted
perturbations (brightness shift, sparse pixel noise, JPEG
recompression), the Spark ``image_phash`` / ``image_near_dup_pairs``
operators over real encoded PNG/JPEG bytes, per-item decode-failure
isolation, and the zero-cartesian plan contract shared with SimHash's
banded hamming join.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hermes_spark.operators.codecs import (
    decode_image_pixels,
    encode_jpeg,
    encode_png,
    phash64,
)
from hermes_spark.operators.multimodal import image_near_dup_pairs, image_phash


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _structured_img(seed: int, h: int = 96, w: int = 128) -> np.ndarray:
    """Deterministic image with real low-frequency structure (smooth
    waves + rectangles) — uniform random noise has no perceptual
    content for a DCT hash to lock onto."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        127
        + 60 * np.sin(xx / (5 + int(r.integers(3, 20))))
        + 50 * np.cos(yy / (4 + int(r.integers(2, 15))))
    )
    for _ in range(4):
        y0, x0 = int(r.integers(0, h // 2)), int(r.integers(0, w // 2))
        img[y0: y0 + int(r.integers(5, h // 2)),
            x0: x0 + int(r.integers(5, w // 2))] += int(r.integers(-60, 60))
    return img.clip(0, 255).astype(np.uint8)


# ------------------------------------------------------------------ kernel


def test_phash_kernel_near_and_far_distances():
    base = _structured_img(1)
    h_base = phash64(base)
    bright = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)
    assert _ham(h_base, phash64(bright)) <= 4
    rng = np.random.default_rng(9)
    noisy = base.copy()
    idx = rng.integers(0, base.size, 200)
    noisy.flat[idx] = rng.integers(0, 255, 200)
    assert _ham(h_base, phash64(noisy)) <= 4
    assert _ham(h_base, phash64(_structured_img(2))) > 12


def test_phash_codec_roundtrips_and_channels():
    base = _structured_img(3)
    h_base = phash64(base)
    # lossless PNG: identical hash; lossy JPEG: a few bits
    assert phash64(decode_image_pixels(encode_png(base))) == h_base
    assert _ham(h_base, phash64(decode_image_pixels(encode_jpeg(base)))) <= 4
    # gray == replicated-RGB (the _gray channel convention)
    assert phash64(np.stack([base] * 3, axis=2)) == h_base
    # resolution change survives (area resample + linear upsample paths)
    assert _ham(h_base, phash64(base[::4, ::4])) <= 12


def test_phash_is_signed_64bit_and_deterministic():
    h = phash64(_structured_img(4))
    assert -(1 << 63) <= h < (1 << 63)
    assert h == phash64(_structured_img(4))


# ------------------------------------------------------------------- spark


@pytest.fixture(scope="module")
def image_frame(spark):
    """9 rows: 3 base images, each with a recompressed JPEG twin; one
    unrelated PNG per base; plus one corrupt-bytes row."""
    rows = []
    for i in range(3):
        base = _structured_img(100 + i)
        rows.append((i * 3, bytearray(encode_png(base))))
        rows.append((i * 3 + 1, bytearray(encode_jpeg(base))))
        rows.append((i * 3 + 2, bytearray(encode_png(_structured_img(200 + i)))))
    rows.append((99, bytearray(b"not an image at all")))
    return spark.createDataFrame(rows, ["img_id", "media"])


def test_image_phash_operator(image_frame):
    got = {r["img_id"]: r for r in image_phash(
        image_frame, "img_id", "media").collect()}
    assert len(got) == 10
    # corrupt row: isolated failure, null hash
    assert got[99]["phash"] is None
    assert got[99]["decode_error"]
    # every decodable row hashed
    for i in range(9):
        assert got[i]["phash"] is not None, i
        assert got[i]["decode_error"] is None, i
    # png/jpeg twins are close; unrelated images are far
    for i in range(3):
        assert _ham(got[i * 3]["phash"], got[i * 3 + 1]["phash"]) <= 6
        assert _ham(got[i * 3]["phash"], got[i * 3 + 2]["phash"]) > 6


def test_image_near_dup_pairs_finds_planted_twins(image_frame):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(
            image_frame, "img_id", "media", max_hamming=6
        ).collect()
    }
    assert set(pairs) == {(0, 1), (3, 4), (6, 7)}, pairs
    assert all(h <= 6 for h in pairs.values())


def test_image_near_dup_plan_has_no_cartesian(image_frame):
    plan = image_near_dup_pairs(
        image_frame, "img_id", "media"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fingerprint_pairs_generic_matches_direct_hamming(spark):
    """The banded join is EXACT for hamming <= max_hamming: compare
    against a brute-force cross check on a small fingerprint set,
    including negative (bit-63) hashes."""
    from hermes_spark.operators.dedup import fingerprint_near_dup_pairs

    def s64(x: int) -> int:
        x &= (1 << 64) - 1
        return x - (1 << 64) if x >= 1 << 63 else x

    rng = np.random.default_rng(5)
    fps = [int(x) for x in rng.integers(-(1 << 62), 1 << 62, 30)]
    fps.append(-(1 << 63) + 5)            # sign-extension exercise
    fps.append(s64(fps[0] ^ 0b101))       # planted hamming-2 twin
    fps.append(s64(fps[31] ^ (1 << 63)))  # differs only in the sign bit
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], ["id", "fp"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in fingerprint_near_dup_pairs(
            df, "id", "fp", bits=64, max_hamming=3
        ).collect()
    }
    expected = {}
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = _ham(fps[i] & ((1 << 64) - 1), fps[j] & ((1 << 64) - 1))
            if h <= 3:
                expected[(i, j)] = h
    assert got == expected
