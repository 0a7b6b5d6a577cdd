"""GIF codec: golden-bytes decode, LZW roundtrips (incl. dictionary
overflow), interlace, disposal/transparency, corruption, Spark path."""

from __future__ import annotations

import numpy as np
import pytest

from xarray_beam_spark.sources.gif import (
    _deinterlace,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

# The canonical 1x1 "transparent pixel" GIF served all over the web:
# white GCT entry 0, black entry 1, GCE marks index 0 transparent.
_WEB_PIXEL = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
    b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
)


def test_golden_web_pixel():
    frames = decode_gif(_WEB_PIXEL)
    assert frames.shape == (1, 1, 1, 3)
    # transparent pixel over the white (entry 0) background stays white
    np.testing.assert_array_equal(frames[0, 0, 0], [255, 255, 255])


def test_lzw_pure_roundtrip():
    rng = np.random.RandomState(0)
    for n_sym, size in [(4, 10), (16, 1000), (256, 20000)]:
        data = rng.randint(0, n_sym, size).astype(np.uint8)
        min_code = max(2, int(np.ceil(np.log2(n_sym))))
        back = _lzw_decode(_lzw_encode(data, min_code), min_code, size)
        np.testing.assert_array_equal(back, data)


def test_lzw_kwkwk_case():
    # 'aabbb...' shapes exercise the code==size (KwKwK) branch
    data = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0], np.uint8)
    back = _lzw_decode(_lzw_encode(data, 2), 2, len(data))
    np.testing.assert_array_equal(back, data)


def test_roundtrip_single_frame():
    rng = np.random.RandomState(1)
    palette = rng.randint(0, 256, (200, 3), np.uint8)
    img = palette[rng.randint(0, 200, (33, 47))]
    back = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(back[0], img)


def test_roundtrip_animation():
    rng = np.random.RandomState(2)
    palette = rng.randint(0, 256, (5, 3), np.uint8)
    frames = palette[rng.randint(0, 5, (4, 13, 9))]
    back = decode_gif(encode_gif(frames, delay_cs=5))
    np.testing.assert_array_equal(back, frames)


def test_roundtrip_dictionary_overflow():
    # 128x128 noise at 256 colors overflows the 4096-entry LZW dictionary,
    # forcing mid-stream clear codes
    rng = np.random.RandomState(3)
    palette = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    img = palette[rng.randint(0, 256, (128, 128))]
    back = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(back[0], img)


def test_deinterlace_order():
    h = 11
    rows = np.arange(h)[:, None] * np.ones((1, 2), int)
    # simulate interlaced storage: rows written in pass order
    order = np.concatenate([np.arange(s, h, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))])
    stored = rows[order]
    np.testing.assert_array_equal(_deinterlace(stored), rows)


def test_too_many_colors_rejected():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (40, 40, 3), np.uint8)  # ~1600 distinct colors
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(img)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"BMP" + b[3:], "not a GIF"),
        (lambda b: b[:-10], "truncated"),
    ],
)
def test_corrupt_inputs_raise(mutate, msg):
    blob = encode_gif(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match=msg):
        decode_gif(mutate(blob))


def test_decode_video_dispatch():
    from xarray_beam_spark.operators.multimodal import decode_video

    frames = np.zeros((2, 3, 3, 3), np.uint8)
    frames[1] = 200
    back = decode_video(encode_gif(frames))
    np.testing.assert_array_equal(back, frames)
    # r13: MJPEG MP4s decode natively (sources/mp4.py) — see
    # tests/test_mp4.py. A structurally-damaged mp4 is loud (ValueError
    # from the box walker), other containers still refuse honestly.
    with pytest.raises(ValueError):
        decode_video(b"\x00\x00\x00\x18ftypmp42-not-supported")
    with pytest.raises(NotImplementedError, match="webm"):
        decode_video(b"\x1a\x45\xdf\xa3 webm-ish garbage")


def test_video_frame_features_spark(spark):
    
    from xarray_beam_spark.operators.multimodal import video_frame_features

    rng = np.random.RandomState(5)
    palette = rng.randint(0, 256, (8, 3), np.uint8)
    rows = []
    for i in range(6):
        frames = palette[rng.randint(0, 8, (i % 3 + 1, 6, 5))]
        rows.append((i, bytearray(encode_gif(frames)), frames))
    df = spark.createDataFrame(
        [(i, blob) for i, blob, _ in rows], ["asset_id", "blob"]
    )
    got = {r["asset_id"]: r for r in video_frame_features(df).collect()}
    for i, _, frames in rows:
        assert got[i]["n_frames"] == frames.shape[0]
        assert got[i]["height"] == 6 and got[i]["width"] == 5
        np.testing.assert_allclose(
            got[i]["mean_luma"],
            frames.astype(np.float64).mean(),
            rtol=1e-12,
        )
