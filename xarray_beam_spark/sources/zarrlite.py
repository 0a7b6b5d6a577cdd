"""Minimal pure-Python Zarr v2 store (local/shared filesystem).

The container has no ``zarr``/``xarray``/``dask``, so the engine carries
its own spec-compliant subset of the Zarr v2 format — enough to give the
Spark engine the reference's headline capability (scalable Zarr read/write,
reference ``xarray_beam/_src/zarr.py``) with stores readable by any
standard Zarr implementation:

- group layout: ``.zgroup`` / ``.zattrs`` at the root, one directory per
  array with ``.zarray`` / ``.zattrs`` and C-order chunk files ``i.j.k``;
- xarray conventions: every array's ``.zattrs`` carries
  ``_ARRAY_DIMENSIONS`` (named dims); 1-D arrays named after their dim are
  index coordinates;
- dtypes: any NumPy dtype string (floats, ints, bool, ``<M8[us]``,
  ``<U#``); compressor ``null`` or numcodecs-standard ``{"id": "zlib"}``
  (stdlib); edge chunks stored padded to full chunk shape per spec.

Everything here is driver/executor-agnostic pure functions over a path —
executors re-open metadata by path (one small JSON read per task) instead
of shipping driver objects, the reference's "compact serialization" rule
(``docs/read-write.ipynb`` Tips).
"""

from __future__ import annotations

import json
import math
import os
import zlib
from dataclasses import dataclass
from typing import Any, Iterator, Mapping, Sequence

import numpy as np

ZARR_FORMAT = 2
_DIMS_ATTR = "_ARRAY_DIMENSIONS"


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ZArray:
    """Metadata of one Zarr v2 array."""

    path: str  # directory containing .zarray
    name: str
    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: np.dtype
    dims: tuple[str, ...]
    fill_value: Any
    compressor: str | None  # None or "zlib"
    attrs: dict[str, Any]

    @property
    def grid_shape(self) -> tuple[int, ...]:
        return tuple(math.ceil(s / c) for s, c in zip(self.shape, self.chunks))

    @property
    def nbytes(self) -> int:
        n = self.dtype.itemsize
        for s in self.shape:
            n *= s
        return n


def _encode_fill(value: Any, dtype: np.dtype) -> Any:
    if value is None:
        return None
    if dtype.kind == "f":
        if math.isnan(value):
            return "NaN"
        if math.isinf(value):
            return "Infinity" if value > 0 else "-Infinity"
        return float(value)
    if dtype.kind in "iub":
        return int(value)
    return None  # datetimes / strings: undefined fill (we always write fully)


def _decode_fill(value: Any, dtype: np.dtype) -> Any:
    if value is None:
        return np.zeros((), dtype)[()]
    if isinstance(value, str) and dtype.kind == "f":
        return {"NaN": math.nan, "Infinity": math.inf, "-Infinity": -math.inf}[value]
    return value


def _default_fill(dtype: np.dtype) -> Any:
    return math.nan if dtype.kind == "f" else None


def create_group(path: str, attrs: Mapping[str, Any] | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": ZARR_FORMAT}, f)
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump(dict(attrs or {}), f, sort_keys=True)


def create_array(
    group_path: str,
    name: str,
    shape: Sequence[int],
    chunks: Sequence[int],
    dtype: np.dtype | str,
    dims: Sequence[str],
    attrs: Mapping[str, Any] | None = None,
    fill_value: Any = "__default__",
    compressor: str | None = "zlib",
) -> ZArray:
    """Write array metadata (no chunk data) — the driver-side skeleton
    (reference ``setup_zarr``, ``zarr.py:462-513``)."""
    dtype = np.dtype(dtype)
    if len(shape) != len(chunks) or len(shape) != len(dims):
        raise ValueError(f"rank mismatch for {name!r}: {shape} {chunks} {dims}")
    if fill_value == "__default__":
        fill_value = _default_fill(dtype)
    apath = os.path.join(group_path, name)
    os.makedirs(apath, exist_ok=True)
    meta = {
        "zarr_format": ZARR_FORMAT,
        "shape": list(int(s) for s in shape),
        "chunks": list(int(c) for c in chunks),
        "dtype": dtype.str,
        "compressor": {"id": "zlib", "level": 1} if compressor == "zlib" else None,
        "fill_value": _encode_fill(fill_value, dtype),
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(apath, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(apath, ".zattrs"), "w") as f:
        json.dump({_DIMS_ATTR: list(dims), **dict(attrs or {})}, f, sort_keys=True)
    return ZArray(
        path=apath,
        name=name,
        shape=tuple(int(s) for s in shape),
        chunks=tuple(int(c) for c in chunks),
        dtype=dtype,
        dims=tuple(dims),
        fill_value=fill_value,
        compressor=compressor,
        attrs=dict(attrs or {}),
    )


def open_array(group_path: str, name: str) -> ZArray:
    apath = os.path.join(group_path, name)
    with open(os.path.join(apath, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != ZARR_FORMAT:
        raise ValueError(f"{name}: unsupported zarr_format {meta.get('zarr_format')}")
    if meta.get("order", "C") != "C":
        raise ValueError(f"{name}: only C order supported")
    if meta.get("filters"):
        raise ValueError(f"{name}: filters not supported")
    comp = meta.get("compressor")
    if comp is None:
        compressor = None
    elif isinstance(comp, dict) and comp.get("id") == "zlib":
        compressor = "zlib"
    else:
        raise ValueError(f"{name}: unsupported compressor {comp}")
    dtype = np.dtype(meta["dtype"])
    attrs: dict[str, Any] = {}
    zattrs = os.path.join(apath, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as f:
            attrs = json.load(f)
    dims = tuple(attrs.pop(_DIMS_ATTR, [f"dim_{i}" for i in range(len(meta["shape"]))]))
    return ZArray(
        path=apath,
        name=name,
        shape=tuple(meta["shape"]),
        chunks=tuple(meta["chunks"]),
        dtype=dtype,
        dims=dims,
        fill_value=_decode_fill(meta.get("fill_value"), dtype),
        compressor=compressor,
        attrs=attrs,
    )


def open_group(path: str) -> tuple[dict[str, ZArray], dict[str, Any]]:
    """Open a Zarr group: ``{array_name: ZArray}`` plus group attrs."""
    if not os.path.exists(os.path.join(path, ".zgroup")):
        raise FileNotFoundError(f"not a zarr group: {path}")
    attrs: dict[str, Any] = {}
    zattrs = os.path.join(path, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as f:
            attrs = json.load(f)
    arrays: dict[str, ZArray] = {}
    for entry in sorted(os.listdir(path)):
        if os.path.exists(os.path.join(path, entry, ".zarray")):
            arrays[entry] = open_array(path, entry)
    return arrays, attrs


# ---------------------------------------------------------------------------
# chunk IO
# ---------------------------------------------------------------------------


def _chunk_fname(grid_idx: tuple[int, ...]) -> str:
    return ".".join(str(i) for i in grid_idx) if grid_idx else "0"


def _compress(meta: ZArray, raw: bytes) -> bytes:
    return zlib.compress(raw, 1) if meta.compressor == "zlib" else raw


def _decompress(meta: ZArray, data: bytes) -> bytes:
    return zlib.decompress(data) if meta.compressor == "zlib" else data


def write_chunk(meta: ZArray, grid_idx: tuple[int, ...], values: np.ndarray) -> int:
    """Write one full (padded) chunk; returns bytes written.

    Atomic rename so Spark task retries / speculative re-writes are safe
    (the reference relies on full-chunk alignment for the same reason,
    ``zarr.py:557-583``).
    """
    if values.shape != meta.chunks:
        raise ValueError(
            f"{meta.name}: chunk {grid_idx} must be padded to {meta.chunks}, got {values.shape}"
        )
    raw = np.ascontiguousarray(values, dtype=meta.dtype).tobytes()
    payload = _compress(meta, raw)
    fname = os.path.join(meta.path, _chunk_fname(grid_idx))
    tmp = f"{fname}.tmp.{os.getpid()}.{id(values)}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, fname)
    return len(payload)


def read_chunk(meta: ZArray, grid_idx: tuple[int, ...]) -> np.ndarray:
    """Read one chunk (padded shape); missing chunk file → fill_value."""
    fname = os.path.join(meta.path, _chunk_fname(grid_idx))
    if not os.path.exists(fname):
        out = np.empty(meta.chunks, dtype=meta.dtype)
        out[...] = meta.fill_value if meta.fill_value is not None else 0
        return out
    with open(fname, "rb") as f:
        raw = _decompress(meta, f.read())
    return np.frombuffer(raw, dtype=meta.dtype).reshape(meta.chunks).copy()


def _grid_range(offset: int, length: int, chunk: int) -> Iterator[tuple[int, int, int, int, int]]:
    """For element range [offset, offset+length) along one dim of chunk
    size ``chunk``: yield (grid_i, src_lo, src_hi, dst_lo, dst_hi) —
    chunk-local and output-local slices."""
    stop = offset + length
    first = offset // chunk
    last = (stop - 1) // chunk
    for gi in range(first, last + 1):
        clo = gi * chunk
        lo = max(offset, clo)
        hi = min(stop, clo + chunk)
        yield gi, lo - clo, hi - clo, lo - offset, hi - offset


def read_region(meta: ZArray, offsets: Mapping[str, int], shape: Mapping[str, int]) -> np.ndarray:
    """Read an arbitrary hyper-rectangle (assembles across zarr chunks)."""
    off = tuple(int(offsets.get(d, 0)) for d in meta.dims)
    shp = tuple(int(shape.get(d, meta.shape[i])) for i, d in enumerate(meta.dims))
    out = np.empty(shp, dtype=meta.dtype)
    per_dim = [list(_grid_range(off[i], shp[i], meta.chunks[i])) for i in range(len(off))]
    if not per_dim:
        return read_chunk(meta, ())[()]

    def rec(axis: int, grid_idx: list[int], src_sl: list[slice], dst_sl: list[slice]):
        if axis == len(per_dim):
            chunk = read_chunk(meta, tuple(grid_idx))
            out[tuple(dst_sl)] = chunk[tuple(src_sl)]
            return
        for gi, slo, shi, dlo, dhi in per_dim[axis]:
            rec(axis + 1, grid_idx + [gi], src_sl + [slice(slo, shi)], dst_sl + [slice(dlo, dhi)])

    rec(0, [], [], [])
    return out


def write_region(meta: ZArray, offsets: Mapping[str, int], values: np.ndarray) -> int:
    """Region-write: offsets must be zarr-chunk-aligned and the region must
    cover whole chunks (or reach the array edge) along every dim — the
    reference's no-partial-chunk-writes safety rule (``zarr.py:516-587``)
    which makes concurrent/retried task writes race-free. Returns bytes
    written (compressed)."""
    off = tuple(int(offsets.get(d, 0)) for d in meta.dims)
    if values.ndim != len(meta.dims):
        raise ValueError(f"{meta.name}: rank mismatch {values.shape} vs dims {meta.dims}")
    validate_region_alignment(meta, off, values.shape)
    written = 0
    per_dim = [list(_grid_range(off[i], values.shape[i], meta.chunks[i])) for i in range(len(off))]
    if not per_dim:
        return write_chunk(meta, (), np.asarray(values, dtype=meta.dtype))

    def rec(axis: int, grid_idx: list[int], src_sl: list[slice]):
        nonlocal written
        if axis == len(per_dim):
            block = values[tuple(src_sl)]
            if block.shape != meta.chunks:  # pad edge chunk per spec
                padded = np.empty(meta.chunks, dtype=meta.dtype)
                padded[...] = (
                    meta.fill_value
                    if meta.fill_value is not None and meta.dtype.kind == "f"
                    else np.zeros((), meta.dtype)[()]
                )
                padded[tuple(slice(0, s) for s in block.shape)] = block
                block = padded
            written += write_chunk(meta, tuple(grid_idx), block)
            return
        for gi, _slo, _shi, dlo, dhi in per_dim[axis]:
            rec(axis + 1, grid_idx + [gi], src_sl + [slice(dlo, dhi)])

    rec(0, [], [])
    return written


def validate_region_alignment(meta: ZArray, off: tuple[int, ...], shape: tuple[int, ...]) -> None:
    for i, d in enumerate(meta.dims):
        if off[i] % meta.chunks[i] != 0:
            raise ValueError(
                f"{meta.name}: write offset {off[i]} along {d!r} not aligned to "
                f"zarr chunk {meta.chunks[i]} — partial-chunk writes race under "
                f"task retries (rechunk first)"
            )
        end = off[i] + shape[i]
        if end % meta.chunks[i] != 0 and end != meta.shape[i]:
            raise ValueError(
                f"{meta.name}: write end {end} along {d!r} is neither chunk-aligned "
                f"nor the array edge {meta.shape[i]}"
            )
        if end > meta.shape[i]:
            raise ValueError(f"{meta.name}: write [{off[i]}, {end}) exceeds size {meta.shape[i]}")


def write_full(meta: ZArray, values: np.ndarray) -> int:
    """Write an entire array (driver-side, used for coordinates)."""
    return write_region(meta, {}, values)


def read_full(meta: ZArray) -> np.ndarray:
    return read_region(meta, {}, {})
