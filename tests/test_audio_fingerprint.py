"""Spectral audio fingerprinting + near-dup pairs (r12c).

The audio member of the perceptual-dedup family (image pHash / video
frame hashes / audio band-difference fingerprint — all feeding the same
banded hamming join).  Kernel distances on planted transformations of
REAL encoded WAV bytes, the Spark operators, decode-failure isolation,
and the no-cartesian plan contract.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hermes_spark.operators.codecs import (
    audio_fingerprint64,
    decode_wav,
    encode_wav,
    synthetic_audio,
)
from hermes_spark.operators.multimodal import (
    audio_fingerprint,
    audio_near_dup_pairs,
)

SR = 16000


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ------------------------------------------------------------------ kernel


def test_audio_fingerprint_invariances():
    base = synthetic_audio(1)
    h = audio_fingerprint64(base, SR)
    # gain scaling and 16-bit WAV round-trip: identical hash
    assert audio_fingerprint64(base * 0.25, SR) == h
    assert audio_fingerprint64(
        decode_wav(encode_wav(base, SR))["samples"], SR) == h
    # low-level added noise: a couple of bits
    noisy = np.clip(
        base + 0.005 * np.random.default_rng(9).standard_normal(base.size),
        -1, 1)
    assert _ham(h, audio_fingerprint64(noisy, SR)) <= 6
    # small trim / time shift: a few bits
    assert _ham(h, audio_fingerprint64(base[200:], SR)) <= 10
    assert _ham(h, audio_fingerprint64(base[: 2 * SR], SR)) <= 10


def test_audio_fingerprint_separates_unrelated_clips():
    for s in range(1, 5):
        h1 = audio_fingerprint64(synthetic_audio(s), SR)
        h2 = audio_fingerprint64(synthetic_audio(s + 50), SR)
        assert _ham(h1, h2) > 14, s


def test_audio_fingerprint_is_signed_64bit_and_deterministic():
    h = audio_fingerprint64(synthetic_audio(4), SR)
    assert -(1 << 63) <= h < (1 << 63)
    assert h == audio_fingerprint64(synthetic_audio(4), SR)
    with pytest.raises(Exception):
        audio_fingerprint64(np.array([]), SR)


# ------------------------------------------------------------------- spark


@pytest.fixture(scope="module")
def audio_frame(spark):
    """3 base clips, each with a gain-changed re-encoded twin; one
    unrelated clip per base; one corrupt row."""
    rows = []
    for i in range(3):
        base = synthetic_audio(300 + i)
        rows.append((i * 3, bytearray(encode_wav(base, SR))))
        rows.append((i * 3 + 1, bytearray(encode_wav(base * 0.4, SR))))
        rows.append(
            (i * 3 + 2, bytearray(encode_wav(synthetic_audio(400 + i), SR)))
        )
    rows.append((99, bytearray(b"definitely not RIFF")))
    return spark.createDataFrame(rows, ["clip_id", "media"])


def test_audio_fingerprint_operator(audio_frame):
    got = {r["clip_id"]: r for r in audio_fingerprint(
        audio_frame, "clip_id", "media").collect()}
    assert len(got) == 10
    assert got[99]["afp"] is None and got[99]["decode_error"]
    for i in range(9):
        assert got[i]["afp"] is not None, i
    for i in range(3):
        assert _ham(got[i * 3]["afp"], got[i * 3 + 1]["afp"]) <= 10
        assert _ham(got[i * 3]["afp"], got[i * 3 + 2]["afp"]) > 10


def test_audio_near_dup_pairs_finds_planted_twins(audio_frame):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup_pairs(
            audio_frame, "clip_id", "media", max_hamming=10
        ).collect()
    }
    assert set(pairs) == {(0, 1), (3, 4), (6, 7)}, pairs


def test_audio_near_dup_plan_has_no_cartesian(audio_frame):
    plan = audio_near_dup_pairs(
        audio_frame, "clip_id", "media"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
