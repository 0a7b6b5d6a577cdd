"""From-spec pure-Python GIF codec (GIF89a specification).

Written so the multimodal VIDEO/animation decode path is REAL instead of
a stub: the container has no PIL/ffmpeg, but GIF is fully specified —
an LZW-compressed indexed-color frame sequence in a simple block
container. Same from-spec discipline as ``png.py`` (PNG), ``wav.py``
(WAV), ``zarrlite`` (Zarr) and ``netcdf3`` (CDF-2).

Decoder: GIF87a/GIF89a, global + local color tables, variable-width LZW
with dictionary reset, interlaced frames, frame composition over the
logical screen (disposal methods 0/1/2/3) and GCE transparency — so
externally-produced animated GIFs from standard encoders decode too.
Encoder: GIF89a, one global color table, full real LZW compression
(dictionary growth + clear codes), multi-frame with per-frame delay.

Outputs: ``decode_gif(blob) -> (n_frames, H, W, 3) uint8``.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, clear + end codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF LZW → palette indices (uint8), little-endian bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(expected, np.uint8)
    n_out = 0

    # dictionary as (prefix_code, last_byte); roots are implicit
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    size = end + 1
    width = min_code_size + 1

    bitbuf = 0
    bits = 0
    pos = 0
    prev = -1
    stack = bytearray()

    while True:
        while bits < width:
            if pos >= len(data):
                if n_out != expected:
                    raise ValueError("LZW stream ended early")
                return out
            bitbuf |= data[pos] << bits
            bits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bits -= width

        if code == clear:
            size = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == end:
            if n_out != expected:
                raise ValueError(f"LZW ended with {n_out}/{expected} pixels")
            return out

        if code < size:
            # known code: walk its chain (pushes last byte first)
            c = code
            while c >= clear:
                stack.append(suffix[c])
                c = prefix[c]
            first = c
            stack.append(c)
            emit = bytes(reversed(stack))
        elif code == size and prev >= 0:
            # KwKwK: code not yet in dictionary — string(prev) + first(prev)
            c = prev
            while c >= clear:
                stack.append(suffix[c])
                c = prefix[c]
            first = c
            stack.append(c)
            emit = bytes(reversed(stack)) + bytes([first])
        else:
            raise ValueError(f"corrupt LZW: code {code} beyond dictionary {size}")
        stack.clear()
        if n_out + len(emit) > expected:
            raise ValueError("LZW produced more pixels than the frame holds")
        out[n_out : n_out + len(emit)] = np.frombuffer(emit, np.uint8)
        n_out += len(emit)

        if prev >= 0 and size < 4096:
            prefix[size] = prev
            suffix[size] = first
            size += 1
            if size == (1 << width) and width < 12:
                width += 1
        prev = code


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Palette indices → GIF LZW bytes (real compression: dict growth,
    clear-code emission on overflow)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    bits = 0

    def put(code: int, width: int) -> None:
        nonlocal bitbuf, bits
        bitbuf |= code << bits
        bits += width
        while bits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    size = end + 1
    width = min_code_size + 1
    put(clear, width)

    data = indices.tobytes()
    if not data:
        put(end, width)
        if bits:
            out.append(bitbuf & 0xFF)
        return bytes(out)

    w = data[0:1]
    for i in range(1, len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        if size < 4096:
            table[wc] = size
            size += 1
            if size == (1 << width) + 1 and width < 12:
                width += 1
        else:
            put(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            size = end + 1
            width = min_code_size + 1
        w = c
    put(table[w], width)
    put(end, width)
    if bits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data, new_pos)."""
    parts = []
    while True:
        if pos >= len(blob):
            raise ValueError("truncated sub-block chain")
        n = blob[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(blob[pos : pos + n])
        if len(parts[-1]) != n:
            raise ValueError("truncated sub-block")
        pos += n


def decode_gif(blob: bytes) -> np.ndarray:
    """GIF bytes → ``(n_frames, H, W, 3)`` uint8 composited frames."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    width, height, flags, bg_index, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((height, width, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    prev_canvas = canvas.copy()

    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = blob[pos]
            pos += 1
            data, pos = _sub_blocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gc_flags = data[0]
                disposal = (gc_flags >> 2) & 0x07
                transparent = data[3] if gc_flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")

        if pos + 9 > len(blob):
            raise ValueError("truncated image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("frame with no color table")
        min_code = blob[pos]
        pos += 1
        data, pos = _sub_blocks(blob, pos)
        idx = _lzw_decode(data, min_code, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)

        before = canvas.copy()
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = table[idx[opaque]]
        else:
            region[:] = table[idx]
        frames.append(canvas.copy())

        if disposal == 2:  # restore to background
            bg = gct[bg_index] if gct is not None and bg_index < len(gct) else 0
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3:  # restore to previous
            canvas = prev_canvas.copy()
        else:
            prev_canvas = before
        transparent = None
        disposal = 0

    if not frames:
        raise ValueError("no frames in GIF")
    return np.stack(frames)


def encode_gif(
    frames: np.ndarray, delay_cs: int = 10, loop: bool = True
) -> bytes:
    """``(n_frames, H, W, 3)`` (or ``(H, W, 3)``) uint8 → animated GIF89a.

    Builds one global color table from the distinct colors across all
    frames (≤ 256 required — quantization is the caller's job)."""
    a = np.asarray(frames)
    if a.ndim == 3:
        a = a[None]
    if a.ndim != 4 or a.shape[-1] != 3 or a.dtype != np.uint8:
        raise ValueError(f"need (n, H, W, 3) uint8, got {a.shape} {a.dtype}")
    n_frames, h, w, _ = a.shape

    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors; quantize to <= 256 first")
    depth = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    table_n = 1 << depth
    palette = np.zeros((table_n, 3), np.uint8)
    palette[: len(colors)] = colors
    indices = inverse.astype(np.uint8).reshape(n_frames, h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += palette.tobytes()
    if loop and n_frames > 1:  # Netscape application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, depth)
    for f in range(n_frames):
        if n_frames > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(indices[f].ravel(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
