"""Property-based tests (Hypothesis) for the from-spec media codecs:
WAV and GIF roundtrips over random shapes/dtypes/contents, raw GIF-LZW
over adversarial symbol streams."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_beam_spark.sources.gif import _lzw_decode, _lzw_encode, decode_gif, encode_gif
from xarray_beam_spark.sources.wav import decode_wav, encode_wav

_FAST = settings(max_examples=30, deadline=None)


@_FAST
@given(
    n=st.integers(1, 300),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    dtype=st.sampled_from(["uint8", "int16", "int32", "float32"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, dtype, seed):
    rng = np.random.RandomState(seed)
    dt = np.dtype(dtype)
    if dt.kind == "f":
        a = rng.uniform(-1, 1, (n, ch)).astype(dt)
    else:
        info = np.iinfo(dt)
        a = rng.randint(info.min, info.max, (n, ch)).astype(dt)
    back, r = decode_wav(encode_wav(a, rate))
    assert r == rate
    np.testing.assert_array_equal(back, a)


@_FAST
@given(
    n_sym=st.integers(2, 256),
    length=st.integers(0, 5000),
    # runs-heavy streams stress dictionary growth; uniform streams stress width
    runs=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_lzw_roundtrip_property(n_sym, length, runs, seed):
    rng = np.random.RandomState(seed)
    if runs and length:
        reps = rng.randint(1, 20, max(1, length // 5))
        syms = rng.randint(0, n_sym, len(reps))
        data = np.repeat(syms, reps)[:length].astype(np.uint8)
    else:
        data = rng.randint(0, n_sym, length).astype(np.uint8)
    min_code = max(2, int(np.ceil(np.log2(max(n_sym, 2)))))
    back = _lzw_decode(_lzw_encode(data, min_code), min_code, len(data))
    np.testing.assert_array_equal(back, data)


@_FAST
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_frames=st.integers(1, 4),
    n_colors=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, n_frames, n_colors, seed):
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    frames = palette[rng.randint(0, n_colors, (n_frames, h, w))]
    back = decode_gif(encode_gif(frames))
    np.testing.assert_array_equal(back, frames)
