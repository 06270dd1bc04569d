"""Property-based tests for the round-6 pure-Python codecs and the
HOCON-lite config parser (hypothesis; no Spark session needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hermes_spark.config_file import parse_hocon_lite
from hermes_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_round_trip_any_shape(h, w, channels, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    feats = decode_png(encode_png(px))
    assert (feats["height"], feats["width"]) == (h, w)
    np.testing.assert_array_equal(feats["pixels"], px)
    # mean_intensity is the mean of the color channels (alpha excluded)
    color = {1: 1, 2: 1, 3: 3, 4: 3}[channels]
    assert abs(feats["mean_intensity"] - px[:, :, :color].mean()) < 1e-9


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4000),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_any_signal(n, sr, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1.0, 1.0, size=n)
    feats = decode_wav(encode_wav(samples, sample_rate=sr))
    assert feats["n_samples"] == n and feats["sample_rate"] == sr
    np.testing.assert_allclose(feats["samples"], samples, atol=2.0 / 32768)
    assert abs(
        feats["rms_energy"] - float(np.sqrt(np.mean(samples**2)))
    ) < 1e-3


_key = st.from_regex(r"[A-Za-z][A-Za-z0-9_\-]{0,15}", fullmatch=True)
_scalar = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.booleans(),
    st.from_regex(r"[A-Za-z0-9 _.\-]{0,20}", fullmatch=True).map(
        lambda s: s.strip()
    ).filter(lambda s: s),
)


def _render(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    return f'"{value}"'


@settings(max_examples=50, deadline=None)
@given(
    block=_key,
    entries=st.dictionaries(_key, _scalar, min_size=1, max_size=8),
    style=st.sampled_from(["block", "dotted", "colon"]),
)
def test_hocon_lite_round_trips_generated_documents(block, entries, style):
    if style == "block":
        body = "\n".join(f"  {k} = {_render(v)}" for k, v in entries.items())
        text = f"{block} {{\n{body}\n}}\n"
    elif style == "dotted":
        text = "\n".join(
            f"{block}.{k} = {_render(v)}" for k, v in entries.items()
        )
    else:
        body = "\n".join(f"  {k}: {_render(v)}" for k, v in entries.items())
        text = f"{block} {{\n{body}\n}}\n"
    flat = parse_hocon_lite(text)
    assert flat == {f"{block}.{k}": v for k, v in entries.items()}
