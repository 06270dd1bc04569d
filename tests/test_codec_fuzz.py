"""Codec robustness fuzz (r12c): every decoder must either return or
raise promptly on arbitrary bytes — never hang, loop, or allocate
unboundedly.  At crawl scale some payloads are ALWAYS malformed; the
per-item isolation in the multimodal operators converts exceptions to
``decode_error`` rows, but only if the kernel actually terminates.

Strategy: hypothesis byte fuzz over three families — pure random,
random with valid magic bytes (exercises deeper parser paths), and
truncations/bitflips of genuinely valid files (the nastiest family:
structurally plausible prefixes).
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hermes_spark.operators.codecs import (
    MediaDecodeError,
    decode_image_pixels,
    decode_wav,
    encode_jpeg,
    encode_png,
    encode_wav,
    phash64,
    synthetic_audio,
    synthetic_image,
)

FUZZ_SETTINGS = dict(
    max_examples=120,
    deadline=2000,  # a decoder taking >2s on <=4KB of junk is a hang
    suppress_health_check=[HealthCheck.too_slow],
)


def _try_decode_image(data: bytes) -> None:
    try:
        px = decode_image_pixels(data)
    except Exception:
        return  # any exception is fine — termination is the contract
    # if it "decoded", the result must be hashable without error
    assert px.size >= 0
    if px.size:
        phash64(px)


def _try_decode_wav(data: bytes) -> None:
    try:
        decode_wav(data)
    except Exception:
        return


@given(st.binary(max_size=4096))
@settings(**FUZZ_SETTINGS)
def test_image_decode_terminates_on_random_bytes(data):
    _try_decode_image(data)


@given(st.binary(max_size=4096))
@settings(**FUZZ_SETTINGS)
def test_image_decode_terminates_on_magic_prefixed_bytes(data):
    _try_decode_image(b"\x89PNG\r\n\x1a\n" + data)
    _try_decode_image(b"\xff\xd8" + data)


@given(st.binary(max_size=4096))
@settings(**FUZZ_SETTINGS)
def test_wav_decode_terminates_on_riff_prefixed_bytes(data):
    _try_decode_wav(data)
    _try_decode_wav(b"RIFF\xff\xff\xff\xffWAVE" + data)


@given(
    st.integers(0, 2**32 - 1),
    st.integers(0, 4),
    st.data(),
)
@settings(**FUZZ_SETTINGS)
def test_corrupted_valid_files_terminate(seed32, which, data):
    """Truncations and bit-flips of genuinely valid PNG/JPEG/WAV files
    — structurally plausible prefixes that reach the deepest parser
    states (zlib streams, Huffman tables, chunk walks)."""
    rng = np.random.default_rng(seed32)
    img = synthetic_image(int(seed32 % 1000), h=24, w=32)
    if which % 3 == 0:
        blob = bytearray(encode_png(img))
    elif which % 3 == 1:
        blob = bytearray(encode_jpeg(img))
    else:
        blob = bytearray(
            encode_wav(synthetic_audio(int(seed32 % 100), secs=0.05), 8000)
        )
    # truncate at a fuzzed point and flip a few bytes
    cut = data.draw(st.integers(1, len(blob)))
    blob = blob[:cut]
    for _ in range(data.draw(st.integers(0, 3))):
        if blob:
            pos = int(rng.integers(0, len(blob)))
            blob[pos] ^= int(rng.integers(1, 256))
    payload = bytes(blob)
    if which % 3 == 2:
        _try_decode_wav(payload)
    else:
        _try_decode_image(payload)


def test_media_decode_error_is_catchable_base():
    with pytest.raises(MediaDecodeError):
        decode_image_pixels(b"junk")
    with pytest.raises(MediaDecodeError):
        decode_wav(b"junk")
