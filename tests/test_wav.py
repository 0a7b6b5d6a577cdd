"""WAV codec: roundtrips, stdlib-`wave` cross-validation, chunk walking,
corruption, and the Spark audio-features path."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from xarray_beam_spark.operators.multimodal import decode_audio
from xarray_beam_spark.sources.wav import decode_wav, encode_wav


def test_golden_header_bytes():
    # one mono int16 frame at 8 kHz: every field hand-computed from the spec
    blob = encode_wav(np.array([258], np.int16), 8000)
    assert blob[:4] == b"RIFF"
    assert struct.unpack_from("<I", blob, 4)[0] == len(blob) - 8
    assert blob[8:12] == b"WAVE"
    assert blob[12:16] == b"fmt "
    assert struct.unpack_from("<I", blob, 16)[0] == 16
    fmt_tag, n_ch, rate, byte_rate, block_align, bits = struct.unpack_from("<HHIIHH", blob, 20)
    assert (fmt_tag, n_ch, rate, byte_rate, block_align, bits) == (1, 1, 8000, 16000, 2, 16)
    assert blob[36:40] == b"data"
    assert struct.unpack_from("<I", blob, 40)[0] == 2
    assert blob[44:46] == b"\x02\x01"  # 258 little-endian
    assert len(blob) == 46


@pytest.mark.parametrize(
    "dtype,shape",
    [
        (np.int16, (100,)),
        (np.int16, (100, 2)),
        (np.uint8, (33,)),
        (np.int32, (17, 3)),
        (np.float32, (64, 2)),
    ],
)
def test_roundtrip(dtype, shape):
    rng = np.random.RandomState(7)
    if np.issubdtype(dtype, np.floating):
        a = rng.uniform(-1, 1, shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.randint(info.min, info.max, shape).astype(dtype)
    back, rate = decode_wav(encode_wav(a, 44100))
    assert rate == 44100
    expect = a[:, None] if a.ndim == 1 else a
    np.testing.assert_array_equal(back, expect)
    assert back.dtype == dtype


def test_odd_data_size_has_pad_byte():
    blob = encode_wav(np.array([1, 2, 3], np.uint8), 8000)
    assert len(blob) % 2 == 0  # padded
    back, _ = decode_wav(blob)
    np.testing.assert_array_equal(back[:, 0], [1, 2, 3])


def test_stdlib_wave_reads_our_output():
    a = (np.arange(50, dtype=np.int16) - 25) * 1000
    blob = encode_wav(np.stack([a, -a], axis=1), 22050)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getnchannels() == 2
        assert w.getframerate() == 22050
        assert w.getsampwidth() == 2
        assert w.getnframes() == 50
        raw = w.readframes(50)
    np.testing.assert_array_equal(
        np.frombuffer(raw, "<i2").reshape(50, 2), np.stack([a, -a], axis=1)
    )


def test_we_read_stdlib_wave_output():
    a = np.array([0, 1000, -1000, 32767, -32768], np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(a.tobytes())
    back, rate = decode_wav(buf.getvalue())
    assert rate == 16000
    np.testing.assert_array_equal(back[:, 0], a)


def test_unknown_chunks_are_skipped():
    a = np.array([5, -5], np.int16)
    blob = encode_wav(a, 8000)
    # splice an odd-sized LIST chunk (with pad) between fmt and data
    head, tail = blob[:36], blob[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = head + extra + tail
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, _ = decode_wav(spliced)
    np.testing.assert_array_equal(back[:, 0], a)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"JUNK" + b[4:], "RIFF"),
        (lambda b: b[:20] + struct.pack("<H", 99) + b[22:], "unsupported format"),
        (lambda b: b[:40] + struct.pack("<I", 10**6) + b[44:], "truncated"),
        (lambda b: b[:12] + b[36:], "data chunk before fmt"),
    ],
)
def test_corrupt_inputs_raise(mutate, msg):
    blob = encode_wav(np.array([1, 2], np.int16), 8000)
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(blob))


def test_decode_audio_dispatch():
    a = np.array([100, -100], np.int16)
    samples, rate = decode_audio(encode_wav(a, 48000))
    assert rate == 48000
    np.testing.assert_array_equal(samples[:, 0], a)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04not-a-wav-file-at-all")


def test_audio_features_spark(spark, sf_dir):
    
    from xarray_beam_spark.operators.multimodal import (
        audio_features,
        documents_as_audio_assets,
    )
    from xarray_beam_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(20)
    feats = audio_features(documents_as_audio_assets(docs)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == len(texts)
    from xarray_beam_spark.operators.multimodal import _AUDIO_RATE, _AUDIO_TILE

    for r in feats:
        raw = np.frombuffer(texts[r["asset_id"]].encode(), np.uint8)
        if len(raw) == 0:
            # mirror the operator's empty-text guard (pads to one zero
            # byte) instead of ZeroDivisionError-ing the test body
            raw = np.zeros(1, np.uint8)
        reps = -(-_AUDIO_TILE // len(raw))
        s = (np.tile(raw, reps)[:_AUDIO_TILE].astype(np.int64) - 128) * 256
        assert r["n_frames"] == _AUDIO_TILE
        assert r["peak"] == int(np.abs(s).max())
        neg = s < 0
        assert r["zero_crossings"] == int((neg[1:] != neg[:-1]).sum())
        np.testing.assert_allclose(r["rms"], np.sqrt((s.astype(np.float64) ** 2).mean()), rtol=0)
        assert r["duration_s"] == _AUDIO_TILE / _AUDIO_RATE
