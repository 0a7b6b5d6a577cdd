"""From-spec pure-Python PNG codec (RFC 2083 / W3C PNG spec).

Written so the multimodal decode path is REAL for PNG instead of a stub:
the container has no PIL/ffmpeg, but PNG needs only zlib (stdlib) plus
the scanline filter algebra, both fully specified. Same from-spec
discipline as ``zarrlite`` (Zarr v2/v3) and ``netcdf3`` (CDF-2).

Supported: 8-bit depth, color types 0 (grayscale), 2 (RGB) and 6 (RGBA),
no interlacing. The encoder emits filter type 0 (None) scanlines; the
decoder implements all five filter types (None/Sub/Up/Average/Paeth), so
externally-produced PNGs from standard encoders decode too.

Outputs: grayscale → (H, W) uint8; RGB/RGBA → (H, W, C) uint8.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compresslevel: int = 6) -> bytes:
    """uint8 array → PNG bytes. (H, W) → grayscale; (H, W, 3) → RGB;
    (H, W, 4) → RGBA."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise TypeError(f"encode_png needs uint8, got {a.dtype}")
    if a.ndim == 2:
        color_type, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prepended to each raw scanline
    raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), compresslevel)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    # int16 arithmetic: predictors are differences of uint8 values
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


MAX_PIXELS = 1 << 28  # decompression-bomb guard, same contract as jpeg.py


def decode_png(blob: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """PNG bytes → uint8 array ((H, W) grayscale or (H, W, C) color).

    Failure contract (fuzz-tested, matching ``jpeg.decode_jpeg``): any
    malformed stream raises ``ValueError``; declared dimensions above
    ``max_pixels`` are rejected before allocation."""
    try:
        return _decode_png(blob, max_pixels)
    except ValueError:
        raise
    except (zlib.error, struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(
            f"PNG: corrupt or truncated stream ({type(e).__name__}: {e})"
        ) from e


def _decode_png(blob: bytes, max_pixels: int) -> np.ndarray:
    if blob[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if w * h > max_pixels:
        raise ValueError(
            f"PNG: declared size {w}x{h} exceeds the {max_pixels}-pixel "
            "guard (decompression bomb?)"
        )
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in (0, 2, 6):
        raise ValueError(f"unsupported color type {color_type} (0/2/6)")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        f = int(filters[y])
        cur = data[y].copy()
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub — sequential in x (cumulative per bpp lane)
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
            out[y] = cur
        elif f == 2:  # Up — vectorized
            out[y] = cur + prior  # uint8 wraps mod 256
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prior[x])) >> 1)) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else np.uint8(0)
                ul = prior[x - bpp] if x >= bpp else np.uint8(0)
                pred = _paeth(
                    np.asarray(left), np.asarray(prior[x]), np.asarray(ul)
                )
                cur[x] = (int(cur[x]) + int(pred)) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"unknown scanline filter {f}")
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img
