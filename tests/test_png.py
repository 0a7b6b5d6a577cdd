"""From-spec PNG codec: roundtrips, every scanline filter, corruption,
and the Spark decode path end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from xarray_beam_spark.sources.png import _chunk, _MAGIC, decode_png, encode_png


def test_roundtrip_grayscale():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 7), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_roundtrip_rgb_rgba():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def _encode_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference forward-filtering straight from the PNG spec, so the
    decoder is checked against an independent implementation of the
    filter algebra (not just its own inverse)."""
    h, w = img.shape
    bpp = 1
    out = bytearray()
    prior = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        cur = img[y].astype(np.int16)
        f = filters[y % len(filters)]
        line = np.zeros(w, dtype=np.uint8)
        for x in range(w):
            left = int(img[y, x - bpp]) if x >= bpp else 0
            up = int(prior[x])
            ul = int(prior[x - bpp]) if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            line[x] = (int(cur[x]) - pred) & 0xFF
        out.append(f)
        out += line.tobytes()
        prior = img[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_all_filter_types(filters):
    rng = np.random.default_rng(sum(filters) + 5)
    img = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    blob = _encode_with_filters(img, filters)
    assert np.array_equal(decode_png(blob), img)


def test_crc_corruption_detected():
    img = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(encode_png(img))
    # flip a byte of the IDAT PAYLOAD (tag offset + 4): index 40 was the
    # last byte of the chunk TAG, which a decoder that CRCs only tags
    # would still catch — payload corruption is the protection under test
    data_off = bytes(blob).find(b"IDAT") + 4
    blob[data_off + 1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a....")


def test_spark_decode_path(spark):
    # PNG blobs through the real extract_features plumbing: synthesize
    # deterministic images, decode with decode_image inside mapInPandas,
    # compare per-asset means against local NumPy
    
    from xarray_beam_spark.operators.multimodal import (
        decode_image,
        extract_features,
    )

    rng = np.random.default_rng(3)
    rows = []
    imgs = {}
    for i in range(20):
        img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        imgs[i] = img
        blob = encode_png(img)
        rows.append(
            (
                i,
                bytearray(blob),
                ("image/png", 8, 8, 0, 0, len(blob)),
            )
        )
    df = spark.createDataFrame(
        rows,
        "asset_id long, blob binary, "
        "meta struct<mime:string,width:int,height:int,n_frames:int,"
        "sample_rate:int,n_bytes:bigint>",
    )
    feats = extract_features(df, decoder=decode_image).toPandas()
    assert len(feats) == 20
    for _, r in feats.iterrows():
        img = imgs[r["asset_id"]]
        assert r["mean_px"] == pytest.approx(img.mean())


def test_corrupted_streams_never_leak_internal_errors():
    """Failure contract (matches jpeg.py): corruption yields either a
    decoded image or ValueError — zlib.error/struct.error never leak."""
    rng = np.random.default_rng(3)
    img = (np.arange(900) % 251).reshape(30, 30).astype(np.uint8)
    blob = encode_png(img)
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            out = decode_png(bytes(b))
            assert out.dtype == np.uint8
        except ValueError:
            pass


def test_decompression_bomb_guard():
    img = np.zeros((4, 4), np.uint8)
    blob = bytearray(encode_png(img))
    # IHDR payload starts 16 bytes in: width/height are the first 8 bytes
    ihdr_payload = blob.find(b"IHDR") + 4
    blob[ihdr_payload : ihdr_payload + 8] = struct.pack(">II", 65535, 65535)
    # re-CRC so the guard (not the CRC check) is what fires
    tag_and_payload = bytes(blob[ihdr_payload - 4 : ihdr_payload + 13])
    crc = zlib.crc32(tag_and_payload) & 0xFFFFFFFF
    blob[ihdr_payload + 13 : ihdr_payload + 17] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="pixel guard"):
        decode_png(bytes(blob))
