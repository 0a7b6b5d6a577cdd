"""``xbs_zarr``: a Spark Python DataSource exposing Zarr stores to SQL.

SURVEY §2.1 maps the reference's ``ReadDataset`` splittable source
(``core.py:675-761``) to "a DataSourceV2 (Python ``DataSource`` API,
Spark 4) 'zarr' format" — this is that source. It turns a Zarr group
into a *long-format* table (one row per grid cell: dim-coordinate
columns + one column per data variable), so plain Spark SQL runs
directly against array stores:

    spark.dataSource.register(ZarrDataSource)
    cells = spark.read.format("xbs_zarr").option("path", p).load()
    cells.where("day >= DATE'2024-02-01'").groupBy("event_type").sum()

Scale design:
- **one input partition per store chunk** (optionally coarsened via the
  ``chunks`` option) — Spark schedules them like any other scan, AQE
  coalesces small ones;
- **predicate pushdown → partition pruning**: ``pushFilters`` keeps
  comparison/equality/IN filters on monotonic 1-D dim coordinates,
  converts them to index windows on the driver (coords are metadata-
  sized), and ``partitions()`` skips chunks outside the window. All
  filters are also returned to Spark for post-scan evaluation, so
  pruning is pure optimization — correctness never depends on it;
- **Arrow-native reads**: ``read()`` yields one pyarrow RecordBatch per
  chunk, assembled from the zarrlite region read with numpy
  repeat/tile coordinate expansion — no per-row Python.
"""

from __future__ import annotations

import json
import math

from typing import Iterator, Sequence

import numpy as np

from xarray_beam_spark._lazy import LazyModule

# deferred to first use (see _lazy.py)
pd = LazyModule("pandas", globals(), "pd")

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

# Deferred (see _lazy.py): the pickled reader/writer state is numpy
# coords + zarrlite.ZArray metadata, so a worker that only plans or
# prunes never needs the zarr_io → dataset import chain; read/write
# tasks import it on first use.
iothread = LazyModule("xarray_beam_spark.sources.iothread", globals(), "iothread")
zarr_io = LazyModule("xarray_beam_spark.sources.zarr_io", globals(), "zarr_io")
zarrlite = LazyModule("xarray_beam_spark.sources.zarrlite", globals(), "zarrlite")


def _np_to_spark(dt: np.dtype) -> T.DataType:
    kind, size = dt.kind, dt.itemsize
    if kind == "f":
        return T.DoubleType() if size == 8 else T.FloatType()
    if kind == "i":
        return {1: T.ByteType(), 2: T.ShortType(), 4: T.IntegerType(), 8: T.LongType()}[size]
    if kind == "u":
        if size == 8:
            # uint64 cannot fit LongType (values >= 2^63 would wrap
            # negative silently) — refuse at schema time
            raise TypeError(
                "uint64 variables are not representable in Spark SQL "
                "(LongType is signed); re-encode as int64 or float64"
            )
        return T.LongType()
    if kind == "b":
        return T.BooleanType()
    if kind == "M":
        return T.TimestampNTZType()
    if kind in "US":
        return T.StringType()
    raise TypeError(f"no Spark SQL type for numpy dtype {dt}")


class ZarrDataSource(DataSource):
    """See module docstring. Options: ``path`` (required), ``chunks``
    (optional JSON dict of per-dim partition granularity in elements;
    defaults to the store chunk grid)."""

    @classmethod
    def name(cls) -> str:
        return "xbs_zarr"

    def _plan(self, coarsen: bool = False):
        path = self.options.get("path")
        if not path:
            raise ValueError("xbs_zarr requires .option('path', <zarr group>)")
        # parsed array metadata rides the plan into every reader/writer
        # instance (pickled per task, KB-sized) — tasks never re-open the
        # group, so metadata is ONE fetch per job even on object stores
        template, store_chunks, arrays = zarr_io.open_zarr_meta(path)
        chunks = dict(store_chunks)
        if self.options.get("chunks"):
            chunks.update({d: int(c) for d, c in json.loads(self.options["chunks"]).items()})
        elif coarsen:
            # READ path only: auto-coarsen tiny store chunks into fewer
            # input partitions — one Python read task per small chunk
            # would mean millions of tasks (and driver-side
            # InputPartition objects) at large store sizes. Grow the
            # partition grid in store-chunk multiples until a partition
            # carries ~target_partition_bytes of cells (default 64 MiB);
            # reads stay chunk-aligned, each task just fetches more
            # chunks (threaded on latency-bound stores). The WRITE path
            # never coarsens: its chunk-ownership grouping must stay at
            # store-chunk granularity or two tasks could assemble the
            # same store chunk.
            target = int(self.options.get("target_partition_bytes", 64 << 20))
            row_bytes = 8 * max(1, len(template.var_meta))
            sizes = dict(template.sizes)
            while True:
                cells = math.prod(min(chunks[d], sizes[d]) for d in sizes)
                if cells * row_bytes >= target:
                    break
                # grow the dim with the most remaining chunks (keeps the
                # partition count balanced across dims)
                cand = max(
                    (d for d in sizes if chunks[d] < sizes[d]),
                    key=lambda d: sizes[d] / chunks[d],
                    default=None,
                )
                if cand is None:
                    break
                chunks[cand] = min(chunks[cand] * 2, sizes[cand])
        # never coarsen the STREAM dim — on EVERY path, including an
        # explicit user ``chunks`` option: the slab is the availability/
        # offset granularity, and waiting for a coarse slab would delay
        # emission of already-durable store chunks
        sd = self.options.get("stream_dim")
        if sd in chunks:
            chunks[sd] = store_chunks[sd]
        dims = sorted(template.sizes)
        var_names = sorted(template.var_meta)
        # explicit column pruning (the Python DataSource API has no
        # pruneColumns pushdown yet): .option("vars", "a,b") reads only
        # those arrays from the store
        if self.options.get("vars"):
            want = [v.strip() for v in self.options["vars"].split(",") if v.strip()]
            unknown = sorted(set(want) - set(var_names))
            if unknown:
                raise ValueError(f"xbs_zarr: unknown vars {unknown}")
            var_names = sorted(want)
        for v in var_names:
            vdims, _ = template.var_meta[v]
            if set(vdims) != set(dims):
                raise ValueError(
                    f"xbs_zarr long format needs every variable on the same dims; "
                    f"{v!r} has {vdims}, store has {tuple(dims)}"
                )
        return path, template, chunks, dims, var_names, arrays

    def schema(self) -> T.StructType:
        _, template, _, dims, var_names, _arrays = self._plan()
        fields = []
        for d in dims:
            if d in template.coords:
                dt = _np_to_spark(template.coords[d].values.dtype)
            else:
                dt = T.LongType()  # bare index for coordinate-less dims
            fields.append(T.StructField(d, dt, False))
        for v in var_names:
            fields.append(
                T.StructField(v, _np_to_spark(np.dtype(template.var_meta[v][1])), True)
            )
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> "ZarrReader":
        return ZarrReader(*self._plan(coarsen=True))

    def streamReader(self, schema: T.StructType) -> "ZarrStreamReader":
        """Streaming read path: tail a Zarr store along a growing
        dimension. ``spark.readStream.format("xbs_zarr")
        .option("path", p).option("stream_dim", "day").load()``.

        The store's extent is fixed at stream start (the reference's
        incremental-write pattern: ``setup_zarr`` the full template once,
        jobs region-write aligned slices as data lands,
        ``zarr.py:149-226,700-716``); *availability* advances as chunk
        files appear. The offset is the count of complete chunk-slabs
        along ``stream_dim``: slab k is available once every variable's
        write-unit files intersecting it exist — aligned atomic writes
        make file presence mean "fully durable"."""
        path, template, chunks, dims, var_names, arrays = self._plan(coarsen=True)
        sd = self.options.get("stream_dim")
        if not sd:
            raise ValueError(
                "xbs_zarr streaming requires .option('stream_dim', <dim>)"
            )
        if sd not in dims:
            raise ValueError(f"stream_dim {sd!r} not in store dims {dims}")
        # (_plan pinned chunks[sd] back to the store chunk — the slab is
        # the availability/offset granularity and is never coarsened)
        return ZarrStreamReader(path, template, chunks, dims, var_names, arrays, sd)

    def writer(self, schema: T.StructType, overwrite: bool) -> "ZarrWriter":
        """SQL write path: ``df.write.format("xbs_zarr").option("path", p)
        .mode("append").save()`` region-writes long-format rows into an
        EXISTING Zarr store (create the store with ``zarr_io.setup_zarr``
        / ``to_zarr`` first — array shapes and coordinates are store
        metadata, not inferable from a row stream).

        Contract for distributed safety: each task's rows must cover
        disjoint store chunks (e.g. ``df.repartition(F.col(dim))`` on the
        chunk-determining dims) — chunk files are written whole via
        atomic rename, so cross-task chunk splits would race. Cells of a
        touched chunk absent from the task's rows take the array fill
        value (NaN), matching the dropna'd long format."""
        return ZarrWriter(*self._plan_write(schema))

    def _plan_write(self, schema: T.StructType):
        path, template, _chunks, dims, var_names, arrays = self._plan()
        # writes buffer/group/flush at the WRITE-UNIT grid (shards when
        # sharded), never the read-side inner-chunk grid
        chunks = _write_unit_grid(dims, arrays, _chunks, var_names)
        cols = [f.name for f in schema.fields]
        missing = [d for d in dims if d not in cols]
        if missing:
            raise ValueError(f"xbs_zarr write needs all dim columns; missing {missing}")
        unknown = [c for c in cols if c not in dims and c not in var_names]
        if unknown:
            raise ValueError(f"xbs_zarr write: unknown columns {unknown}")
        write_vars = [v for v in var_names if v in cols]
        return path, template, chunks, dims, write_vars, arrays

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> "ZarrStreamWriter":
        """Streaming write path: ``df.writeStream.format("xbs_zarr")
        .option("path", p)`` region-writes each micro-batch's long-format
        rows into an existing store — the native form of the foreachBatch
        →Zarr bridge (``streaming/events_stream.py``). Same distributed-
        safety contract as the batch writer (tasks own whole chunks);
        batch replays after failure rewrite identical bytes, so the sink
        is idempotent without a commit log."""
        return ZarrStreamWriter(*self._plan_write(schema))


class ZarrReader(DataSourceReader):
    def __init__(self, path, template, chunks, dims, var_names, arrays):
        self.path = path
        self.arrays = arrays
        self.chunks = chunks
        self.dims = dims
        self.var_names = var_names
        self.sizes = {d: int(template.sizes[d]) for d in dims}
        # 1-D dim coords only; metadata-sized, shipped with the (pickled) reader
        self.coords = {
            d: np.asarray(template.coords[d].values)
            for d in dims
            if d in template.coords and template.coords[d].dims == (d,)
        }
        # index windows [lo, hi) per dim, tightened by pushFilters
        self.window = {d: (0, self.sizes[d]) for d in dims}

    # -- pushdown ---------------------------------------------------------
    def _axis(self, d: str, lo: int = 0, hi: int | None = None) -> np.ndarray:
        """Coordinate window [lo, hi) — for coordinate-less dims the index
        values themselves, generated for the WINDOW only (a full-dim
        arange per task would allocate gigabytes on a 1e9-element dim)."""
        hi = self.sizes[d] if hi is None else hi
        a = self.coords.get(d)
        if a is None:
            return np.arange(lo, hi)
        return a[lo:hi]

    def _tighten(self, d: str, lo: int, hi: int) -> None:
        a, b = self.window[d]
        self.window[d] = (max(a, lo), min(b, hi))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr and len(attr) == 1 and attr[0] in self.dims:
                d = attr[0]
                if d in self.coords:
                    vals = self.coords[d]
                else:
                    # coordinate-less dim: the axis IS 0..n-1 — a bounded
                    # arange is enough for the searchsorted windows below
                    # (a full arange would allocate 8 GB on a 1e9 dim)
                    vals = np.arange(min(self.sizes[d], 1 << 22))
                    if self.sizes[d] > len(vals):
                        # huge index dim: prune with window arithmetic
                        # (no array).  Fractional literals must round
                        # TOWARD keeping indices — int() truncation on
                        # e.g. LessThan(3.5) would drop index 3, and a
                        # pruning loss can never be restored by Spark's
                        # post-scan re-filter.  (Spark's
                        # UnwrapCastInBinaryComparison normally
                        # normalizes such predicates away, so this is a
                        # guard, not a hot path.)
                        import math

                        v = getattr(f, "value", None)
                        if (
                            isinstance(v, bool)
                            or not isinstance(v, (int, float))
                            or (isinstance(v, float) and not math.isfinite(v))
                        ):
                            continue
                        n = self.sizes[d]
                        if isinstance(f, EqualTo):
                            if isinstance(v, int) or v.is_integer():
                                self._tighten(d, int(v), int(v) + 1)
                        elif isinstance(f, GreaterThan):
                            self._tighten(d, math.floor(v) + 1, n)
                        elif isinstance(f, GreaterThanOrEqual):
                            self._tighten(d, math.ceil(v), n)
                        elif isinstance(f, LessThan):
                            self._tighten(d, 0, math.ceil(v))
                        elif isinstance(f, LessThanOrEqual):
                            self._tighten(d, 0, math.floor(v) + 1)
                        continue
                if vals.ndim == 1 and bool((vals[1:] >= vals[:-1]).all()):
                    v = getattr(f, "value", None)
                    try:
                        if isinstance(f, EqualTo):
                            self._tighten(d, *_eq_window(vals, v))
                        elif isinstance(f, In):
                            los, his = zip(*[_eq_window(vals, x) for x in f.value])
                            self._tighten(d, min(los), max(his))
                        elif isinstance(f, GreaterThan):
                            self._tighten(d, int(np.searchsorted(vals, _np(v, vals), "right")), self.sizes[d])
                        elif isinstance(f, GreaterThanOrEqual):
                            self._tighten(d, int(np.searchsorted(vals, _np(v, vals), "left")), self.sizes[d])
                        elif isinstance(f, LessThan):
                            self._tighten(d, 0, int(np.searchsorted(vals, _np(v, vals), "left")))
                        elif isinstance(f, LessThanOrEqual):
                            self._tighten(d, 0, int(np.searchsorted(vals, _np(v, vals), "right")))
                    except (TypeError, ValueError):
                        pass  # incomparable literal: no pruning from this filter
        # Spark re-evaluates everything post-scan; pruning stays best-effort.
        return iter(filters)

    # -- planning ---------------------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        spans = []
        for d in self.dims:
            lo, hi = self.window[d]
            if lo >= hi:
                # a fully-pruned scan must return a marker partition, not
                # []: PySpark substitutes [None] for an empty list and
                # then calls read(None), which would crash on .value
                return [InputPartition(None)]
            c = self.chunks[d]
            spans.append(
                [(o, min(o + c, hi)) for o in range((lo // c) * c, hi, c)]
            )
            # clamp the first chunk's leading edge to the window start
            spans[-1][0] = (max(spans[-1][0][0], lo), spans[-1][0][1])
        out = []
        for idx in np.ndindex(*[len(s) for s in spans]):
            part = {d: spans[i][idx[i]] for i, d in enumerate(self.dims)}
            out.append(InputPartition(part))
        return out

    # -- execution --------------------------------------------------------
    def read(self, partition: InputPartition):
        import pyarrow as pa

        part: dict[str, tuple[int, int]] | None = partition.value
        if part is None:
            return  # fully-pruned scan: zero rows
        offsets = {d: lo for d, (lo, _) in part.items()}
        shape = {d: hi - lo for d, (lo, hi) in part.items()}
        ext = [shape[d] for d in self.dims]
        cells = int(math.prod(ext))
        if cells == 0:
            return
        arrays = self.arrays
        cols = []
        for i, d in enumerate(self.dims):
            axis = self._axis(d, offsets[d], offsets[d] + ext[i])
            inner = int(math.prod(ext[i + 1 :]))
            outer = int(math.prod(ext[:i]))
            cols.append(pa.array(np.tile(np.repeat(axis, inner), outer)))
        from xarray_beam_spark.sources import iothread

        def read_var(v):
            meta = arrays[v]
            region = zarr_io.read_region_decoded(meta, offsets, shape)
            # store dim order may differ from the sorted column order
            order = [meta.logical_dims.index(d) for d in self.dims]
            flat = np.ascontiguousarray(region.transpose(order)).reshape(cells)
            if flat.dtype.kind == "u":
                # schema() declared LongType for unsigned dtypes; emit
                # int64 Arrow data to match (a raw uint8 batch would fail
                # the JVM-side Arrow type check)
                flat = flat.astype(np.int64)
            return pa.array(flat)

        # per-variable IO threading on latency-bound stores
        cols += iothread.thread_map(read_var, self.var_names, iothread.io_width(self.path))
        yield pa.RecordBatch.from_arrays(cols, names=self.dims + self.var_names)


class ZarrStreamReader(DataSourceStreamReader):
    """Micro-batch reader over a growing Zarr store (see
    ``ZarrDataSource.streamReader``). Composition: batch planning and
    Arrow chunk reads are delegated to :class:`ZarrReader` with its
    stream-dim window pinned to the batch's slab range, so executors run
    the exact same pruned-scan code path as the batch source.

    Scale note: ``latestOffset`` advances a driver-side frontier by
    probing write-unit file presence for the next slab(s) — one
    ``exists`` per (variable × unit) per new slab, metadata-sized work
    like any file-listing streaming source. A store written with a
    commit-marker convention could answer this with one group-attr read;
    the probe needs no writer cooperation."""

    def __init__(self, path, template, chunks, dims, var_names, arrays, stream_dim):
        self.inner = ZarrReader(path, template, chunks, dims, var_names, arrays)
        self.stream_dim = stream_dim
        self.slab = int(chunks[stream_dim])
        self.size_sd = int(template.sizes[stream_dim])
        self.n_slabs = -(-self.size_sd // self.slab)
        self._frontier_cache = 0

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"slab": 0}

    def _slab_ready(self, arrays, k: int) -> bool:
        lo, hi = k * self.slab, min((k + 1) * self.slab, self.size_sd)
        for v in self.inner.var_names:
            meta = arrays[v]
            ax = meta.dims.index(self.stream_dim)
            c = meta.chunks[ax]
            sd_range = range(lo // c, -(-hi // c))
            other = [
                range(-(-s // cc)) if i != ax else [0]
                for i, (s, cc) in enumerate(zip(meta.shape, meta.chunks))
            ]
            for idx in np.ndindex(*[len(r) for r in other]):
                base = [other[i][idx[i]] for i in range(len(other))]
                for sk in sd_range:
                    base[ax] = sk
                    if not zarrlite.chunk_file_exists(meta, tuple(base)):
                        return False
        return True

    def latestOffset(self) -> dict:
        arrays = self.inner.arrays  # metadata static; availability below
        # probes chunk FILE presence, which is what actually advances
        k = self._frontier_cache
        while k < self.n_slabs and self._slab_ready(arrays, k):
            k += 1
        self._frontier_cache = k
        return {"slab": k}

    # -- planning / execution --------------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = int(start["slab"]), int(end["slab"])
        lo, hi = s * self.slab, min(e * self.slab, self.size_sd)
        if lo >= hi:
            return [InputPartition({d: (0, 0) for d in self.inner.dims})]
        saved = self.inner.window[self.stream_dim]
        try:
            self.inner.window[self.stream_dim] = (lo, hi)
            return self.inner.partitions()
        finally:
            self.inner.window[self.stream_dim] = saved

    def read(self, partition: InputPartition):
        return self.inner.read(partition)

    def commit(self, end: dict) -> None:
        return None


def _write_unit_grid(dims, arrays, store_chunks, var_names=None) -> dict:
    """Per-dim WRITE-UNIT grid. ``open_zarr_meta``'s chunk grid is the
    inner-chunk view — right for reads, but writes must buffer, group,
    own and flush at each array's write unit (the SHARD when v3-sharded,
    else the chunk): per dim, the lcm across variables, so every flushed
    region is whole-unit-aligned for every variable it touches. Without
    this, SQL writes to sharded or mixed-chunk-grid stores fail
    validate_region_alignment on every task."""
    grid = {d: int(store_chunks[d]) for d in dims}
    # DATA variables only: coordinate arrays are often single-chunk over
    # the whole axis, and folding their grid in would inflate the write
    # unit to the full dimension
    names = var_names if var_names is not None else [
        v for v in arrays if v not in dims
    ]
    for v in names:
        meta = arrays[v]
        unit = meta.write_unit[:-1] if meta.wrapped else meta.write_unit
        for dim, u in zip(meta.logical_dims, unit):
            if dim in grid:
                grid[dim] = math.lcm(grid[dim], int(u))
    return grid


def _dim_index(d: str, axis, size: int, vals: np.ndarray) -> np.ndarray:
    """Global element indices for one dim's coordinate values
    (searchsorted on the metadata-sized axis; bare int indices for
    coordinate-less dims). Raises on values not on the axis.

    The ONE implementation shared by the writer's chunk grouping and
    :func:`repartition_for_write`'s shuffle key — if these ever
    diverged, a 'compliant' repartition could still fail the ownership
    check (or worse, pass it with a different grouping)."""
    if axis is None:
        idx = vals.astype(np.int64)
        if (idx < 0).any() or (idx >= size).any():
            raise ValueError(f"index out of range for coordinate-less dim {d!r}")
        return idx
    v = vals.astype(axis.dtype) if axis.dtype.kind == "M" else vals
    if len(axis) > 1 and axis[0] > axis[-1]:
        # descending axis (ERA5-style latitude): searchsorted needs
        # ascending input — index the reversed view and map back
        rev = axis[::-1]
        pos = np.clip(np.searchsorted(rev, v, side="left"), 0, len(rev) - 1)
        idx = (len(axis) - 1) - pos
    else:
        idx = np.clip(np.searchsorted(axis, v, side="left"), 0, len(axis) - 1)
    if not (axis[idx] == v).all():
        bad = np.asarray(v)[axis[idx] != v][:3]
        raise ValueError(f"values not on the {d!r} coordinate axis: {bad!r}")
    return idx.astype(np.int64)


def _linear_chunk_key(
    dims, sizes: dict, chunks: dict, idx: dict
) -> np.ndarray:
    """Row-wise linear chunk id from per-dim element indices (C-order
    over the per-dim chunk grids) — shared with repartition_for_write."""
    key = np.zeros(len(next(iter(idx.values()))), dtype=np.int64)
    for d in dims:
        n_chunks = -(-sizes[d] // chunks[d])
        key = key * n_chunks + idx[d] // chunks[d]
    return key


class ZarrCommitMessage(WriterCommitMessage):
    """Per-task commit payload: the linear keys of every store chunk the
    task wrote, so ``commit()`` can reject cross-task chunk splits."""

    def __init__(self, chunk_keys: tuple = ()):
        self.chunk_keys = tuple(chunk_keys)


class ZarrWriter(DataSourceArrowWriter):
    """Executor-side chunk assembly for the ``xbs_zarr`` write path.

    Each task buffers its rows, maps dim-coordinate values to global
    indices via ``searchsorted`` on the (metadata-sized) coordinate axes,
    groups cells by store chunk, assembles each touched chunk as a dense
    array (fill value for uncovered cells), and region-writes it through
    ``zarrlite.write_region`` — chunk-aligned, atomic-rename, idempotent
    under task retries (same rows → same bytes), the same guarantees as
    ``zarr_io.to_zarr`` (reference ``zarr.py:590-633`` parity)."""

    def __init__(self, path, template, chunks, dims, var_names, arrays):
        self.path = path
        self.arrays = arrays
        self.dims = dims
        self.var_names = var_names
        self.chunks = {d: int(chunks[d]) for d in dims}
        self.sizes = {d: int(template.sizes[d]) for d in dims}
        self.axes = {
            d: np.asarray(template.coords[d].values)
            for d in dims
            if d in template.coords and template.coords[d].dims == (d,)
        }

    def _index(self, d: str, vals: np.ndarray) -> np.ndarray:
        return _dim_index(d, self.axes.get(d), self.sizes[d], vals)

    def _key_to_offsets(self, key: int) -> dict[str, int]:
        """Inverse of the linear chunk key: per-dim element offsets."""
        out: dict[str, int] = {}
        for d in reversed(self.dims):
            n_chunks = -(-self.sizes[d] // self.chunks[d])
            key, c = divmod(key, n_chunks)
            out[d] = c * self.chunks[d]
        return out

    def write(self, iterator):
        # Streaming chunk assembly: process one Arrow batch at a time into
        # dense per-chunk buffers (fill value for uncovered cells) instead
        # of materializing the whole task partition.  Task memory is
        # bounded by (touched chunks x chunk nbytes), which under the
        # chunk-ownership contract enforced in commit() is the task's own
        # chunks — independent of row count.
        cdims = self.dims
        arrays = None
        bufs: dict[int, dict[str, np.ndarray]] = {}
        extents: dict[int, dict[str, int]] = {}
        for batch in iterator:
            n = batch.num_rows
            if n == 0:
                continue
            if arrays is None:
                arrays = self.arrays
            names = batch.schema.names
            col = {
                nm: batch.column(i).to_numpy(zero_copy_only=False)
                for i, nm in enumerate(names)
            }
            idx = {d: self._index(d, col[d]) for d in cdims}
            key = _linear_chunk_key(cdims, self.sizes, self.chunks, idx)
            order = np.argsort(key, kind="stable")
            bounds = np.flatnonzero(np.diff(key[order])) + 1
            for rows in np.split(order, bounds):
                k = int(key[rows[0]])
                if k not in bufs:
                    offsets = self._key_to_offsets(k)
                    extent = {
                        d: min(self.chunks[d], self.sizes[d] - offsets[d])
                        for d in cdims
                    }
                    extents[k] = extent
                    cells = int(math.prod(extent.values()))
                    bufs[k] = {}
                    for v in self.var_names:
                        meta_v = arrays[v]
                        # buffers live in the DECODED domain (CF-packed
                        # arrays: float + NaN); cf_encode packs at write
                        dt = np.dtype(zarr_io.cf_decoded_dtype(meta_v))
                        if zarr_io._cf_spec(meta_v) is not None:
                            fv = np.nan
                        else:
                            # uncovered cells take the store's fill_value
                            # so a partially-covered chunk is consistent
                            # with chunks never written at all
                            fv = meta_v.fill_value
                            if fv is None:
                                fv = np.nan if dt.kind == "f" else 0
                        bufs[k][v] = np.full(cells, fv, dtype=dt)
                offsets = self._key_to_offsets(k)
                extent = extents[k]
                local = [idx[d][rows] - offsets[d] for d in cdims]
                flat = np.ravel_multi_index(local, [extent[d] for d in cdims])
                for v in self.var_names:
                    vals = col[v][rows]
                    buf = bufs[k][v]
                    if buf.dtype.kind != "f" and vals.dtype.kind == "f":
                        # Arrow hands a null-bearing integer column to
                        # numpy as float64+NaN; NaN into an int buffer
                        # raises a bare numpy cast error deep in the
                        # task. NULL cell == absent cell: keep the fill.
                        present = ~np.isnan(vals)
                        buf[flat[present]] = vals[present]
                    else:
                        buf[flat] = vals  # later rows win
        def flush(kv) -> None:
            k, v = kv
            offsets = self._key_to_offsets(k)
            extent = extents[k]
            meta = arrays[v]
            block = bufs[k][v].reshape([extent[d] for d in cdims])
            # store dim order may differ from sorted column order
            perm = [cdims.index(d) for d in meta.logical_dims]
            zarrlite.write_region(
                meta,
                {d: offsets[d] for d in meta.logical_dims},
                np.ascontiguousarray(
                    zarr_io.cf_encode(meta, block.transpose(perm))
                ),
            )

        # flush puts threaded on latency-bound stores (width 1 on local
        # FS) — a task owning N chunks pays ~N/16 round-trips, not N
        iothread.thread_map(
            flush,
            [(k, v) for k in sorted(bufs) for v in self.var_names],
            iothread.io_width(self.path),
        )
        return ZarrCommitMessage(chunk_keys=tuple(sorted(bufs)))

    def _check_ownership(self, messages) -> None:
        """Fail the job if two tasks wrote the same store chunk.

        Chunk files are written whole via atomic rename, so a chunk split
        across tasks is last-rename-wins — the losing task's cells would
        silently vanish.  The reference takes the same stance and rejects
        unaligned writes outright (``zarr.py:516-587``); here alignment is
        per-task, so the check must span tasks and live in ``commit()``."""
        owner: dict[int, int] = {}
        dups: list[int] = []
        for t, m in enumerate(messages):
            for k in getattr(m, "chunk_keys", ()) or ():
                if k in owner and owner[k] != t:
                    dups.append(k)
                else:
                    owner[k] = t
        if dups:
            where = [self._key_to_offsets(k) for k in dups[:3]]
            raise ValueError(
                f"xbs_zarr write: {len(dups)} store chunk(s) were written by more "
                f"than one task (first offsets: {where}); cells from all but the "
                "last task to commit each chunk were LOST. Partition the DataFrame "
                "so each task owns whole chunks — e.g. "
                "xarray_beam_spark.sources.spark_datasource.repartition_for_write("
                "df, path) — and rewrite the store."
            )

    def commit(self, messages):
        self._check_ownership(messages)
        return None

    def abort(self, messages):
        # chunk writes are atomic renames; a failed job leaves either the
        # old or the new version of each chunk, never a torn file
        return None


class ZarrStreamWriter(DataSourceStreamArrowWriter):
    """Micro-batch sink delegating chunk assembly to :class:`ZarrWriter`
    (identical executor code path as the batch SQL write)."""

    def __init__(self, *args):
        self._writer = ZarrWriter(*args)

    def write(self, iterator):
        return self._writer.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        # same cross-task chunk-ownership contract, checked per micro-batch
        self._writer._check_ownership(messages)
        return None

    def abort(self, messages, batchId: int) -> None:
        # aligned atomic chunk renames: a failed batch leaves whole old or
        # whole new chunks; the replayed batch rewrites identical bytes
        return None


def _np(v, like: np.ndarray):
    """Convert a Spark literal to the coord's numpy domain for searchsorted."""
    if like.dtype.kind == "M":
        return np.datetime64(v).astype(like.dtype)
    return v


def _eq_window(vals: np.ndarray, v) -> tuple[int, int]:
    x = _np(v, vals)
    return (
        int(np.searchsorted(vals, x, "left")),
        int(np.searchsorted(vals, x, "right")),
    )


def _jvm_dim_index(d: str, axis, df):
    """Whole-stage-codegen expression for a dim's global element index, or
    ``None`` when the axis can't be expressed JVM-side (irregular spacing,
    float labels, oversized categorical maps) and the caller must fall
    back to the vectorized-UDF path.

    Covers the axes real stores have: regularly-spaced timestamps
    (``timestampdiff``/``unix_micros`` arithmetic — no timezone
    interpretation for NTZ columns), regularly-spaced integers, and
    bounded categorical labels (an O(1) literal-map lookup, not an O(n)
    array scan). Unlike the UDF path this does NOT pre-validate that
    values sit on the axis — the writer re-derives indices from the same
    shared ``_dim_index`` math and still fails loudly on off-axis values;
    only the error site moves from the shuffle to the write task."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as ST

    if axis is None:
        return df[d].cast("long")
    axis = np.asarray(axis)
    if axis.ndim != 1 or len(axis) == 0:
        return None
    if len(axis) == 1:
        return F.lit(0).cast("long")
    if axis.dtype.kind == "M":
        us = axis.astype("datetime64[us]").astype(np.int64)
        steps = np.diff(us)
        if not ((steps > 0).all() and (steps == steps[0]).all()):
            return None
        step = int(steps[0])
        spark_t = df.schema[d].dataType
        # `div` (integer division), never `/`: long / long in Spark SQL
        # detours through double, which is exact only below 2^53 — a µs
        # axis spanning 285+ years (or ns-epoch ints) would misindex some
        # rows, splitting one store chunk across two shuffle keys. For
        # on-axis values the diff is a non-negative exact multiple of
        # step, where div == floor-div; off-axis values fail loudly in
        # the writer's _dim_index validation regardless of their key.
        if isinstance(spark_t, ST.TimestampNTZType):
            origin = str(np.datetime64(axis[0], "us")).replace("T", " ")
            return F.expr(
                f"timestampdiff(MICROSECOND, timestamp_ntz'{origin}', `{d}`) "
                f"div {step}"
            ).cast("long")
        if isinstance(spark_t, ST.TimestampType):
            return F.expr(
                f"(unix_micros(`{d}`) - {int(us[0])}L) div {step}"
            ).cast("long")
        return None
    if axis.dtype.kind in "iu":
        iv = axis.astype(np.int64)
        steps = np.diff(iv)
        if not ((steps > 0).all() and (steps == steps[0]).all()):
            return None
        return F.expr(
            f"(cast(`{d}` as bigint) - {int(iv[0])}L) div {int(steps[0])}"
        ).cast("long")
    if axis.dtype.kind in "USO" and len(axis) <= 4096:
        pairs: list = []
        for i, v in enumerate(axis.tolist()):
            pairs += [F.lit(str(v)), F.lit(i)]
        return F.element_at(F.create_map(*pairs), df[d].cast("string")).cast("long")
    return None


def repartition_for_write(df, path: str, chunks: dict | None = None, num_partitions: int | None = None):
    """Shuffle a long-format DataFrame so every task owns whole store
    chunks — the precondition the ``xbs_zarr`` writer enforces in
    ``commit()``.

    The Python DataSource writer API has no ``requiredDistribution`` hook
    (unlike JVM DSv2's ``RequiresDistributionAndOrdering``), so the plan
    can't inject this shuffle itself; this helper is the one-call way to
    satisfy the contract.  The chunk key mirrors the writer's own index
    math (shared ``_dim_index``/``_linear_chunk_key`` helpers), then
    ``df.repartition(key)`` hash-partitions on it, so any one chunk key
    lands in exactly one task (several chunks may share a task, which is
    fine: ownership stays disjoint).

    The key is a pure JVM expression whenever every axis allows it
    (regular timestamp/integer spacing, bounded categorical labels — see
    :func:`_jvm_dim_index`): the whole read→key→shuffle pipeline then
    stays inside whole-stage codegen with no extra Arrow hop, which at
    100 TB removes a full Python round-trip of the data. Irregular or
    float axes fall back to a vectorized (Arrow-batched) pandas UDF with
    the writer's strict off-axis validation."""
    from pyspark.sql import functions as F

    template, store_chunks, arrays = zarr_io.open_zarr_meta(path)
    dims = sorted(template.sizes)
    # mirror the writer exactly: keys group at the WRITE-UNIT grid
    cchunks = _write_unit_grid(dims, arrays, store_chunks)
    if chunks:
        cchunks.update({d: int(c) for d, c in chunks.items()})
    sizes = {d: int(template.sizes[d]) for d in dims}
    axes = {
        d: np.asarray(template.coords[d].values)
        for d in dims
        if d in template.coords and template.coords[d].dims == (d,)
    }
    n_chunks_d = {d: -(-sizes[d] // cchunks[d]) for d in dims}

    jvm_idx: dict[str, object] = {}
    for d in dims:
        c = _jvm_dim_index(d, axes.get(d), df)
        if c is None:
            break
        jvm_idx[d] = c
    if len(jvm_idx) == len(dims):
        key_col = F.lit(0).cast("long")
        for d in dims:
            key_col = key_col * F.lit(n_chunks_d[d]) + F.floor(
                jvm_idx[d] / F.lit(cchunks[d])
            ).cast("long")
    else:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _chunk_key(cols: pd.DataFrame) -> pd.Series:
            # the writer's exact index + key math (shared helpers), incl.
            # its strict off-axis validation — bad values fail HERE with a
            # clear message instead of later inside the write job
            idx = {
                d: _dim_index(d, axes.get(d), sizes[d], cols[d].to_numpy())
                for d in dims
            }
            return pd.Series(_linear_chunk_key(dims, sizes, cchunks, idx))

        key_col = _chunk_key(F.struct(*[df[d] for d in dims]))
    if num_partitions is not None:
        # an explicit request is the caller's memory sizing — honoring a
        # silent 2048 clamp would multiply per-task chunk volume ~4x on a
        # big write with no indication why executors OOM
        n_parts = num_partitions
    else:
        n_parts = min(int(math.prod(n_chunks_d.values())), 2048)
    return df.repartition(n_parts, key_col)


def register(spark) -> None:
    """Idempotent registration of the ``xbs_zarr`` format.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, default false): with it off, Spark refuses any reader that
    implements ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ZarrDataSource)
