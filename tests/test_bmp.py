"""From-spec BMP codec: roundtrips, row padding, exotic-but-legal
layouts (top-down, 1/4/32 bpp), loud failures on what we can't decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xarray_beam_spark.sources.bmp import decode_bmp, encode_bmp


def test_gray_roundtrip_all_padding_widths():
    rng = np.random.default_rng(0)
    for w in range(1, 9):  # every stride-padding remainder
        img = rng.integers(0, 256, size=(5, w), dtype=np.uint8)
        got = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(got, img)
        assert got.ndim == 2  # grayscale palette collapses back to 2-D


def test_rgb_roundtrip():
    rng = np.random.default_rng(1)
    for w in (1, 2, 3, 4, 5):
        img = rng.integers(0, 256, size=(4, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def _patch_header(blob: bytes, **fields) -> bytes:
    """Rewrite BITMAPINFOHEADER fields of an encoded BMP."""
    names = [
        "hsize", "width", "height", "planes", "bpp", "comp", "isize",
        "xp", "yp", "ncolors", "imp",
    ]
    vals = dict(zip(names, struct.unpack_from("<IiiHHIIiiII", blob, 14)))
    vals.update(fields)
    out = bytearray(blob)
    struct.pack_into("<IiiHHIIiiII", out, 14, *[vals[n] for n in names])
    return bytes(out)


def test_top_down_rows():
    img = np.arange(24, dtype=np.uint8).reshape(6, 4)
    blob = encode_bmp(img)
    # flip to top-down: negate height and reverse the stored row order
    data_off = struct.unpack_from("<I", blob, 10)[0]
    stride = 4
    rows = [
        blob[data_off + i * stride : data_off + (i + 1) * stride]
        for i in range(6)
    ]
    flipped = blob[:data_off] + b"".join(reversed(rows))
    flipped = _patch_header(flipped, height=-6)
    np.testing.assert_array_equal(decode_bmp(flipped), img)


def test_32bpp_decode():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + 2 * 12, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 32, 0, 0, 0, 0, 0, 0)
    rows = bytearray()
    for y in (1, 0):  # bottom-up
        for x in range(3):
            r, g, b = img[y, x]
            rows += bytes((b, g, r, 0))
    np.testing.assert_array_equal(decode_bmp(head + info + bytes(rows)), img)


def test_4bpp_and_1bpp_palette_decode():
    # 4 bpp: width 3 (odd nibble count), palette = 16-gray ramp
    pal4 = b"".join(bytes((17 * i, 17 * i, 17 * i, 0)) for i in range(16))
    head = struct.pack("<2sIHHI", b"BM", 0, 0, 0, 14 + 40 + 64)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 1, 1, 4, 0, 0, 0, 0, 16, 0)
    row = bytes((0x12, 0x30, 0, 0))  # pixels 1,2,3 + pad to stride 4
    got = decode_bmp(head + info + pal4 + row)
    np.testing.assert_array_equal(got, [[17, 34, 51]])
    # 1 bpp: black/white, width 10 crosses a byte boundary
    pal1 = bytes((0, 0, 0, 0, 255, 255, 255, 0))
    head = struct.pack("<2sIHHI", b"BM", 0, 0, 0, 14 + 40 + 8)
    info = struct.pack("<IiiHHIIiiII", 40, 10, 1, 1, 1, 0, 0, 0, 0, 2, 0)
    row = bytes((0b10110000, 0b01000000, 0, 0))  # MSB-first, pad to 4
    got = decode_bmp(head + info + pal1 + row)
    np.testing.assert_array_equal(
        got, [[255, 0, 255, 255, 0, 0, 0, 0, 0, 255]]
    )


def test_color_palette_decodes_to_rgb():
    pal = bytes((255, 0, 0, 0)) + bytes((0, 0, 255, 0))  # blue, red (BGRX)
    pal += bytes(4) * 254
    head = struct.pack("<2sIHHI", b"BM", 0, 0, 0, 14 + 40 + 1024)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, 0, 0, 0, 256, 0)
    row = bytes((0, 1, 0, 0))
    got = decode_bmp(head + info + pal + row)
    assert got.shape == (1, 2, 3)
    np.testing.assert_array_equal(got[0, 0], [0, 0, 255])  # blue as RGB
    np.testing.assert_array_equal(got[0, 1], [255, 0, 0])  # red


def test_loud_failures():
    img = np.zeros((2, 2), np.uint8)
    blob = encode_bmp(img)
    with pytest.raises(ValueError, match="compression id"):
        decode_bmp(_patch_header(blob, comp=1))  # BI_RLE8
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(_patch_header(blob, bpp=16))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(blob[:-3])
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + blob[2:])
    with pytest.raises(ValueError, match="uint8"):
        encode_bmp(np.zeros((2, 2), np.float64))
    with pytest.raises(ValueError, match="empty"):
        encode_bmp(np.zeros((0, 5), np.uint8))  # undecodable if emitted
    with pytest.raises(ValueError, match="empty"):
        encode_bmp(np.zeros((5, 0, 3), np.uint8))


def test_data_offset_inside_metadata_rejected():
    # A data_offset pointing into the header/palette region must not
    # silently decode metadata bytes as pixels (ADVICE r10).
    gray = encode_bmp(np.zeros((2, 2), np.uint8))
    bad = bytearray(gray)
    struct.pack_into("<I", bad, 10, 14)  # file-header size only
    with pytest.raises(ValueError, match="data offset"):
        decode_bmp(bytes(bad))
    rgb = encode_bmp(np.zeros((2, 2, 3), np.uint8))
    bad = bytearray(rgb)
    struct.pack_into("<I", bad, 10, 40)  # inside the info header
    with pytest.raises(ValueError, match="data offset"):
        decode_bmp(bytes(bad))


def test_wide_image_strides():
    # Wide rows exercise the vectorized pad-to-stride row assembly on
    # every padding remainder at realistic widths (encoder rewrite r11).
    rng = np.random.default_rng(7)
    for w in (509, 510, 511, 512):
        gray = rng.integers(0, 256, size=(3, w), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(gray)), gray)
        rgb = rng.integers(0, 256, size=(2, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(rgb)), rgb)


def test_decode_image_dispatch():
    from xarray_beam_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_bmp(gray)), gray)
    rgb = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    luma = (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    np.testing.assert_array_equal(decode_image(encode_bmp(rgb)), luma)


def test_truecolor_with_declared_palette_still_decodes():
    # biClrUsed set on a 24 bpp file whose pixels start right after the
    # headers: the palette is an unused optimization hint we never read,
    # so the data-offset guard must not demand room for it
    # (code-review finding r11).
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3) * 3
    blob = _patch_header(encode_bmp(img), ncolors=256)
    np.testing.assert_array_equal(decode_bmp(blob), img)
