"""From-spec BMP (Windows DIB) codec — pure numpy, no imaging libs.

Completes the multimodal image family (PNG ``png.py``, JPEG ``jpeg.py``,
GIF ``gif.py``) with the simplest widely-produced raster container:
BITMAPFILEHEADER + BITMAPINFOHEADER (the universally-written 40-byte v3
header), uncompressed ``BI_RGB`` pixel data, 4-byte-aligned rows stored
bottom-up (or top-down when the height is negative).

Encoder writes the two layouts practically everything emits:
  * 8 bpp + 256-entry grayscale palette for ``(H, W) uint8`` input,
  * 24 bpp BGR for ``(H, W, 3) uint8`` input.
Decoder additionally reads 1/4 bpp palette and 32 bpp BGRX files.
Anything else (RLE4/RLE8/bitfields/embedded PNG-JPEG compression ids)
fails loudly — decoding garbage is the one unacceptable outcome.

Layout reference: the public BITMAPFILEHEADER/BITMAPINFOHEADER layout
(Windows SDK ``wingdi.h``), same ground rules as every open-source BMP
reader/writer.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # size..important colors


def _row_stride(width: int, bpp: int) -> int:
    return ((width * bpp + 31) // 32) * 4


def encode_bmp(img: np.ndarray) -> bytes:
    """Serialize ``(H, W) uint8`` (8 bpp grayscale palette) or
    ``(H, W, 3) uint8`` RGB (24 bpp BGR) as an uncompressed bottom-up
    BMP. Lossless for both layouts."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"BMP encoder takes uint8, got {img.dtype}")
    if img.size == 0:
        raise ValueError(
            f"BMP cannot represent empty images (shape {img.shape})"
        )
    if img.ndim == 2:
        h, w = img.shape
        bpp = 8
        palette = bytearray()
        for v in range(256):
            palette += bytes((v, v, v, 0))  # BGRX grayscale ramp
        stride = _row_stride(w, bpp)
        padded = np.zeros((h, stride), np.uint8)
        padded[:, :w] = img
        rows = padded[::-1].tobytes()  # bottom-up
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        bpp = 24
        palette = bytearray()
        stride = _row_stride(w, bpp)
        padded = np.zeros((h, stride), np.uint8)
        padded[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
        rows = padded[::-1].tobytes()
    else:
        raise ValueError(f"BMP encoder takes (H,W) or (H,W,3), got {img.shape}")
    data_offset = _FILE_HEADER.size + _INFO_HEADER.size + len(palette)
    info = _INFO_HEADER.pack(
        _INFO_HEADER.size, w, h, 1, bpp, 0, len(rows), 2835, 2835,
        len(palette) // 4, 0,
    )
    head = _FILE_HEADER.pack(b"BM", data_offset + len(rows), 0, 0, data_offset)
    return head + info + bytes(palette) + bytes(rows)


def decode_bmp(blob: bytes) -> np.ndarray:
    """Parse an uncompressed ``BI_RGB`` BMP. Returns ``(H, W) uint8``
    when the file is paletted and the palette is a pure grayscale ramp,
    else ``(H, W, 3) uint8`` RGB. Bottom-up and top-down row orders and
    1/4/8/24/32 bpp are supported; compressed ids raise."""
    if len(blob) < _FILE_HEADER.size + _INFO_HEADER.size:
        raise ValueError("truncated BMP: shorter than its headers")
    magic, _fsize, _r1, _r2, data_offset = _FILE_HEADER.unpack_from(blob, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (hsize, w, h, planes, bpp, comp, _isize, _xp, _yp, ncolors, _imp) = (
        _INFO_HEADER.unpack_from(blob, _FILE_HEADER.size)
    )
    if hsize < _INFO_HEADER.size:
        raise ValueError(f"unsupported BMP header size {hsize} (pre-v3 core header)")
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    if comp != 0:
        raise ValueError(
            f"unsupported BMP compression id {comp} (only BI_RGB=0 decodes)"
        )
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    stride = _row_stride(w, bpp)
    need = data_offset + stride * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(blob)}")

    palette = None
    # Lower-bound the pixel offset by the metadata we actually READ:
    # headers always, plus the palette for indexed depths. Truecolor
    # files may declare biClrUsed without storing an optimization
    # palette, and we never read it — only the header bound applies.
    palette_bytes = (ncolors or (1 << bpp)) * 4 if bpp <= 8 else 0
    if data_offset < _FILE_HEADER.size + hsize + palette_bytes:
        # A data_offset inside the header/palette region would silently
        # decode metadata bytes as pixel rows — fail loudly instead.
        raise ValueError(
            f"bad BMP data offset {data_offset}: pixel data cannot start "
            f"before byte {_FILE_HEADER.size + hsize + palette_bytes}"
        )
    if bpp <= 8:
        n = ncolors or (1 << bpp)
        poff = _FILE_HEADER.size + hsize
        praw = np.frombuffer(blob, np.uint8, n * 4, poff).reshape(n, 4)
        palette = praw[:, [2, 1, 0]].copy()  # BGRX -> RGB

    raw = np.frombuffer(blob, np.uint8, stride * h, data_offset).reshape(h, stride)
    if not top_down:
        raw = raw[::-1]
    if bpp == 24:
        px = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return np.ascontiguousarray(px)
    if bpp == 32:
        px = raw[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
        return np.ascontiguousarray(px)
    if bpp == 8:
        idx = raw[:, :w]
    elif bpp == 4:
        hi = raw >> 4
        lo = raw & 0x0F
        interleaved = np.empty((h, stride * 2), np.uint8)
        interleaved[:, 0::2], interleaved[:, 1::2] = hi, lo
        idx = interleaved[:, :w]
    else:  # 1 bpp, MSB first
        bits = np.unpackbits(raw, axis=1)
        idx = bits[:, :w]
    if idx.max(initial=0) >= len(palette):
        raise ValueError("BMP palette index out of range")
    if np.all(palette[:, 0] == palette[:, 1]) and np.all(
        palette[:, 1] == palette[:, 2]
    ):
        return np.ascontiguousarray(palette[:, 0][idx])  # grayscale ramp
    return np.ascontiguousarray(palette[idx])
