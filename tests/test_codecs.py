"""Round-6: real (dependency-free) PNG/WAV codecs + their use as the
default decoders in the multimodal mapInPandas operators."""

import base64
import struct
import zlib

import numpy as np
import pytest

from hermes_spark.operators.codecs import (
    MediaDecodeError,
    decode_audio,
    decode_image,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

# The ubiquitous 1x1 PNG (public sample bytes used everywhere on the
# web) — decoding it proves the parser runs on a real-world file, not
# just our own encoder's output.
ONE_BY_ONE_PNG = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def test_decode_real_world_png():
    feats = decode_png(ONE_BY_ONE_PNG)
    assert feats["width"] == 1 and feats["height"] == 1
    assert feats["pixels"].shape[0] == 1 and feats["pixels"].shape[1] == 1
    assert 0.0 <= feats["mean_intensity"] <= 255.0


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip_exact(channels):
    rng = np.random.default_rng(42 + channels)
    px = rng.integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    feats = decode_png(encode_png(px))
    assert feats["width"] == 7 and feats["height"] == 13
    np.testing.assert_array_equal(feats["pixels"], px)


def test_png_all_filter_types_unfilter():
    # hand-build a 4-wide, 5-tall grayscale PNG using every filter type
    # (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) and check the recovered
    # pixels against an independently computed expectation
    rows = np.array(
        [
            [10, 20, 30, 40],
            [15, 25, 35, 45],
            [100, 110, 120, 130],
            [90, 95, 105, 115],
            [7, 14, 21, 28],
        ],
        dtype=np.uint8,
    )
    # filter each row manually
    def sub(cur):
        out = cur.astype(int).copy()
        for i in range(1, len(out)):
            out[i] = (cur[i] - cur[i - 1]) % 256
        return out

    def up(cur, prev):
        return (cur.astype(int) - prev.astype(int)) % 256

    def avg(cur, prev):
        out = cur.astype(int).copy()
        for i in range(len(out)):
            left = int(cur[i - 1]) if i else 0
            out[i] = (int(cur[i]) - ((left + int(prev[i])) >> 1)) % 256
        return out

    def paeth_predict(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    def paeth(cur, prev):
        out = cur.astype(int).copy()
        for i in range(len(out)):
            left = int(cur[i - 1]) if i else 0
            ul = int(prev[i - 1]) if i else 0
            out[i] = (int(cur[i]) - paeth_predict(left, int(prev[i]), ul)) % 256
        return out

    raw = bytearray()
    raw += b"\x00" + bytes(rows[0])                          # None
    raw += b"\x01" + bytes(sub(rows[1]).astype(np.uint8))    # Sub
    raw += b"\x02" + bytes(up(rows[2], rows[1]).astype(np.uint8))
    raw += b"\x03" + bytes(avg(rows[3], rows[2]).astype(np.uint8))
    raw += b"\x04" + bytes(paeth(rows[4], rows[3]).astype(np.uint8))

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    feats = decode_png(png)
    np.testing.assert_array_equal(feats["pixels"][:, :, 0], rows)


def test_png_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    feats = decode_png(png)
    assert feats["channels"] == 3
    np.testing.assert_array_equal(feats["pixels"][0, 0], [255, 0, 0])
    np.testing.assert_array_equal(feats["pixels"][1, 0], [0, 0, 255])


def test_png_corruption_detected():
    good = encode_png(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(MediaDecodeError, match="signature"):
        decode_png(b"JUNK" + good)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte inside IEND CRC
    with pytest.raises(MediaDecodeError, match="CRC"):
        decode_png(bytes(bad_crc))


def test_wav_round_trip():
    sr = 8000
    t = np.arange(sr) / sr  # 1 second
    samples = 0.5 * np.sin(2 * np.pi * 440 * t)
    feats = decode_wav(encode_wav(samples, sample_rate=sr))
    assert feats["sample_rate"] == sr
    assert feats["channels"] == 1 and feats["bits"] == 16
    assert feats["n_samples"] == sr
    assert feats["duration_ms"] == 1000
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.3536
    assert abs(feats["rms_energy"] - 0.5 / np.sqrt(2)) < 1e-3
    np.testing.assert_allclose(feats["samples"], samples, atol=2.0 / 32768)


def test_wav_rejects_non_wav():
    with pytest.raises(MediaDecodeError):
        decode_wav(b"not audio at all")


# --- Spark integration: real decode through mapInPandas -------------------


def test_real_png_decode_through_mapinpandas(spark):
    from hermes_spark.operators import extract_image_features

    rng = np.random.default_rng(7)
    rows = []
    expected = {}
    for i in range(20):
        h, w = 4 + i % 5, 3 + i % 7
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, bytearray(encode_png(px))))
        expected[i] = (w, h, float(px.mean()))
    rows.append((99, bytearray(b"this is not a png")))
    df = spark.createDataFrame(rows, "media_id int, data binary").repartition(4)

    # DEFAULT decoder — the real PNG parser
    feats = {r.media_id: r for r in extract_image_features(
        df, "media_id", "data"
    ).collect()}
    assert len(feats) == 21
    for i, (w, h, mean) in expected.items():
        assert feats[i].decode_error is None
        assert (feats[i].width, feats[i].height) == (w, h)
        assert abs(feats[i].mean_intensity - mean) < 1e-9
    assert feats[99].decode_error is not None and feats[99].width is None


def test_real_wav_decode_through_mapinpandas(spark):
    from hermes_spark.operators import extract_audio_features

    sr = 16000
    rows = []
    for i in range(5):
        n = sr // (i + 1)
        samples = 0.25 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)
        rows.append((i, bytearray(encode_wav(samples, sample_rate=sr))))
    rows.append((9, bytearray(b"mp3?????")))
    df = spark.createDataFrame(rows, "clip_id int, data binary")

    feats = {r.clip_id: r for r in extract_audio_features(
        df, "clip_id", "data"
    ).collect()}
    assert feats[0].sample_rate == sr
    assert feats[0].duration_ms == 1000
    assert feats[1].duration_ms == 500
    assert abs(feats[0].rms_energy - 0.25 / np.sqrt(2)) < 1e-3
    assert feats[9].decode_error is not None


def test_decode_image_audio_feature_contract():
    px = np.full((3, 3), 128, dtype=np.uint8)
    f = decode_image(encode_png(px))
    assert set(f) == {"width", "height", "mean_intensity"}
    a = decode_audio(encode_wav(np.zeros(100)))
    assert set(a) == {"sample_rate", "duration_ms", "rms_energy"}


def test_png_filters_rgb_random_roundtrip():
    """r7 vectorized unfilter: every filter type on MULTI-channel rows
    (the lane reshape must respect bpp) against a forward filter."""
    rng = np.random.RandomState(42)
    h, w, ch = 6, 5, 3
    px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    flat = px.reshape(h, w * ch).astype(int)
    bpp = ch

    def fwd(ftype, cur, prev):
        out = cur.copy()
        for i in range(len(cur)):
            left = cur[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 1:
                out[i] = (cur[i] - left) % 256
            elif ftype == 2:
                out[i] = (cur[i] - prev[i]) % 256
            elif ftype == 3:
                out[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
            elif ftype == 4:
                p = left + prev[i] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    prev[i] if pb <= pc else ul)
                out[i] = (cur[i] - pred) % 256
        return out

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=int)
    for y in range(h):
        ftype = y % 5
        if ftype == 0:
            enc = flat[y]
        else:
            enc = fwd(ftype, flat[y], prev)
        raw += bytes([ftype]) + bytes(enc.astype(np.uint8))
        prev = flat[y]

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(png)["pixels"], px)


# --------------------------------------------------------------------------
# baseline JPEG (r8)
# --------------------------------------------------------------------------

def _gradient_rgb(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([
        (xx * 255 // max(w - 1, 1)).astype(np.uint8),
        (yy * 255 // max(h - 1, 1)).astype(np.uint8),
        ((xx + yy) * 255 // max(w + h - 2, 1)).astype(np.uint8),
    ], axis=2)


def test_jpeg_roundtrip_444_near_lossless():
    from hermes_spark.operators.codecs import decode_jpeg, encode_jpeg

    img = _gradient_rgb(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert (out["width"], out["height"], out["channels"]) == (56, 40, 3)
    assert np.abs(out["pixels"].astype(int) - img.astype(int)).max() <= 12
    assert abs(out["mean_intensity"] - img.mean()) < 3


def test_jpeg_roundtrip_420_subsampled():
    from hermes_spark.operators.codecs import decode_jpeg, encode_jpeg

    img = _gradient_rgb(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert out["pixels"].shape == (40, 56, 3)
    # chroma halved: looser bound, still recognizably the same image
    assert np.abs(out["pixels"].astype(int) - img.astype(int)).max() <= 40


def test_jpeg_grayscale_and_odd_sizes():
    from hermes_spark.operators.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    g = (np.arange(40)[:, None] * np.ones(56)[None, :] * 6).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out["channels"] == 1
    assert np.abs(out["pixels"][:, :, 0].astype(int) - g.astype(int)).max() <= 8
    for hh, ww in [(1, 1), (7, 9), (17, 23), (8, 8)]:
        im = rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8)
        o = decode_jpeg(encode_jpeg(im, quality=90, subsample=True))
        assert (o["height"], o["width"]) == (hh, ww)


def test_jpeg_restart_markers_bit_identical():
    from hermes_spark.operators.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    im = rng.integers(0, 256, (33, 49, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(im, quality=90, subsample=True))["pixels"]
    for ri in (1, 2, 5):
        rst = decode_jpeg(
            encode_jpeg(im, quality=90, subsample=True, restart_interval=ri)
        )["pixels"]
        assert np.array_equal(base, rst), ri


def test_jpeg_corruption_detected():
    from hermes_spark.operators.codecs import (
        MediaDecodeError,
        decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(_gradient_rgb(16, 16))
    for bad in (b"", b"\xff\xd8\x00\x00", b"not a jpeg", good[:40]):
        with pytest.raises(MediaDecodeError):
            decode_jpeg(bad)


def test_mixed_png_jpeg_decode_through_mapinpandas(spark):
    """decode_image dispatches on signature, so one binary column can
    mix Common-Crawl-style JPEG payloads with PNGs; undecodable bytes
    isolate per item."""
    from hermes_spark.operators import extract_image_features
    from hermes_spark.operators.codecs import encode_jpeg

    rng = np.random.default_rng(11)
    rows, expected = [], {}
    for i in range(12):
        h, w = 8 + i % 5, 6 + i % 7
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if i % 2 == 0:
            rows.append((i, bytearray(encode_png(px))))
            expected[i] = (w, h, float(px.mean()), 0.0)
        else:
            rows.append((i, bytearray(encode_jpeg(px, quality=90))))
            expected[i] = (w, h, float(px.mean()), 8.0)  # lossy tolerance
    rows.append((99, bytearray(b"neither format")))
    df = spark.createDataFrame(rows, "media_id int, data binary").repartition(3)
    feats = {r.media_id: r for r in extract_image_features(
        df, "media_id", "data"
    ).collect()}
    assert len(feats) == 13
    for i, (w, h, mean, tol) in expected.items():
        assert feats[i].decode_error is None, feats[i]
        assert (feats[i].width, feats[i].height) == (w, h)
        assert abs(feats[i].mean_intensity - mean) <= tol + 1e-9
    assert feats[99].decode_error is not None
