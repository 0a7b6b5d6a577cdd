"""From-spec pure-Python WAV (RIFF/WAVE) codec.

Written so the multimodal AUDIO decode path is REAL instead of a stub:
the container has no audio libraries, but canonical WAV is just the RIFF
container (Microsoft/IBM RIFF spec; "WAVE" form) around raw PCM — fully
specified and trivially parseable with ``struct`` + NumPy. Same from-spec
discipline as ``png.py`` (PNG), ``zarrlite`` (Zarr v2/v3) and
``netcdf3`` (CDF-2).

Supported: PCM (format tag 1) at 8-bit unsigned and 16/32-bit signed
little-endian, plus IEEE float32 (format tag 3); any channel count; any
sample rate. The chunk walker skips unknown chunks (``LIST``, ``fact``,
``cue ``, ...) including the mandatory pad byte after odd-sized chunks,
so externally-produced WAVs from standard encoders decode too.

Outputs: ``decode_wav(blob) -> (samples, sample_rate)`` where samples is
``(n_frames, n_channels)``; int16 for 16-bit PCM, int32 for 32-bit,
uint8 for 8-bit, float32 for IEEE-float files.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3

_ENCODE_DTYPES = {
    np.dtype(np.uint8): (_PCM, 8),
    np.dtype(np.int16): (_PCM, 16),
    np.dtype(np.int32): (_PCM, 32),
    np.dtype(np.float32): (_IEEE_FLOAT, 32),
}

_DECODE_DTYPES = {
    (_PCM, 8): np.dtype("u1"),
    (_PCM, 16): np.dtype("<i2"),
    (_PCM, 32): np.dtype("<i4"),
    (_IEEE_FLOAT, 32): np.dtype("<f4"),
}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Samples → canonical WAV bytes (RIFF → fmt → data).

    ``samples`` is ``(n_frames,)`` mono or ``(n_frames, n_channels)``;
    dtype selects the encoding (uint8 / int16 / int32 PCM, float32 IEEE).
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {a.shape}")
    try:
        fmt_tag, bits = _ENCODE_DTYPES[a.dtype]
    except KeyError:
        raise TypeError(
            f"unsupported sample dtype {a.dtype}; one of "
            f"{sorted(str(d) for d in _ENCODE_DTYPES)}"
        ) from None
    n_frames, n_ch = a.shape
    if not (1 <= n_ch <= 0xFFFF):
        raise ValueError(f"channel count {n_ch} out of range")
    payload = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<"), copy=False)).tobytes()
    block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    chunks = b"WAVE"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:  # RIFF: chunks are word-aligned via a pad byte
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ``((n_frames, n_channels) samples, sample_rate)``.

    Walks the RIFF chunk list: requires one ``fmt `` before ``data``,
    skips everything else (with odd-size padding), and validates sizes so
    truncated/corrupt input fails loudly instead of mis-slicing.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    end = min(8 + riff_size, len(blob))

    fmt = None
    pos = 12
    while pos + 8 <= end:
        tag = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body_start = pos + 8
        if body_start + size > len(blob):
            raise ValueError(f"truncated {tag!r} chunk: need {size} bytes")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too small ({size} bytes)")
            fmt = struct.unpack_from("<HHIIHH", blob, body_start)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            fmt_tag, n_ch, rate, _byte_rate, _block_align, bits = fmt
            try:
                dt = _DECODE_DTYPES[(fmt_tag, bits)]
            except KeyError:
                raise ValueError(
                    f"unsupported format: tag={fmt_tag} bits={bits}"
                ) from None
            if n_ch < 1:
                raise ValueError("zero channels")
            frame_bytes = dt.itemsize * n_ch
            n_frames = size // frame_bytes
            flat = np.frombuffer(blob, dt, count=n_frames * n_ch, offset=body_start)
            return flat.reshape(n_frames, n_ch), rate
        pos = body_start + size + (size % 2)  # skip pad byte after odd chunks
    raise ValueError("no data chunk found")
