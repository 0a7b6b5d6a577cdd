"""Chunk keys and chunk-grid math (pure, no Spark).

Parity target: ``xarray_beam/_src/core.py:59-416`` (Key, offsets↔slices,
chunk expansion, key iteration). Fresh implementation — the semantics are
documented in SURVEY.md §1.1-1.2; no reference code is copied.

A *chunk grid* is a dict ``{dim: int}`` of per-dimension chunk sizes over a
dict of total sizes ``{dim: int}``; the last chunk along a dim may be
smaller. A :class:`Key` locates a chunk by its integer element offsets from
the origin, optionally restricted to a subset of variables.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field
from typing import Iterator, Mapping


@dataclass(frozen=True)
class Key:
    """Location of a chunk: per-dim element offsets + optional var subset.

    Mirrors ``xarray_beam.Key`` (reference ``core.py:59-237``): immutable,
    hashable, deterministic ordering of state. ``vars=None`` means "all
    variables".
    """

    offsets: tuple[tuple[str, int], ...] = ()
    vars: frozenset[str] | None = None

    def __post_init__(self):
        # The reference's public constructor spelling is
        # ``Key({'x': 0}, vars={'foo'})`` (core.py:59-130): accept the
        # Mapping/set forms directly and normalize to the canonical
        # hashable state, so ported call sites work unchanged.
        if isinstance(self.offsets, Mapping):
            object.__setattr__(self, "offsets", tuple(sorted(self.offsets.items())))
        else:
            # canonicalize tuple/list-of-pairs construction too: an
            # unsorted pair tuple would make Key((('y',0),('x',0))) hash
            # differently from Key.make({'x':0,'y':0}) — one chunk's
            # records silently split into two groups when construction
            # styles mix — and a list would be unhashable in a frozen Key
            object.__setattr__(
                self, "offsets", tuple(sorted((str(d), int(o)) for d, o in self.offsets))
            )
        if isinstance(self.vars, str):
            raise TypeError(f"vars must be a set of names, not {self.vars!r}")
        if self.vars is not None and not isinstance(self.vars, frozenset):
            object.__setattr__(self, "vars", frozenset(self.vars))

    @staticmethod
    def make(offsets: Mapping[str, int] | None = None, vars: frozenset[str] | set[str] | None = None) -> "Key":
        off = tuple(sorted((offsets or {}).items()))
        v = frozenset(vars) if vars is not None else None
        return Key(off, v)

    @property
    def offsets_dict(self) -> dict[str, int]:
        return dict(self.offsets)

    def with_offsets(self, **updates: int | None) -> "Key":
        """Return a new Key with some offsets replaced (None deletes)."""
        off = self.offsets_dict
        for dim, val in updates.items():
            if val is None:
                off.pop(dim, None)
            else:
                off[dim] = val
        return Key.make(off, self.vars)

    def replace_vars(self, vars: frozenset[str] | set[str] | None) -> "Key":
        return Key.make(self.offsets_dict, vars)

    # -- indices mode (reference ``core.py:71-80``: a newer data model the
    # reference itself marks "not yet fully supported"; here it's a pure
    # view — keys store element offsets, indices convert on a chunk grid,
    # so both addressing modes name the same chunk row). ----------------

    @staticmethod
    def from_indices(
        indices: Mapping[str, int],
        chunks: Mapping[str, int],
        vars: frozenset[str] | set[str] | None = None,
    ) -> "Key":
        """Build a Key from chunk *indices* on a chunk grid:
        ``indices={'x': 4}`` with ``chunks={'x': 100}`` ≡ ``offsets={'x': 400}``."""
        return Key.make({d: i * chunks[d] for d, i in indices.items()}, vars)

    def indices(self, chunks: Mapping[str, int]) -> dict[str, int]:
        """Chunk indices of this key on a chunk grid. Raises if any offset
        is not aligned to the grid (such a chunk has no index address)."""
        out = {}
        for d, off in self.offsets:
            c = chunks[d]
            if c <= 0 or off % c:
                raise ValueError(
                    f"offset {off} along {d!r} is not a multiple of chunk {c}"
                )
            out[d] = off // c
        return out

    def __repr__(self) -> str:
        ov = ", ".join(f"{d}={o}" for d, o in self.offsets)
        vv = "None" if self.vars is None else "{" + ", ".join(sorted(self.vars)) + "}"
        return f"Key({ov}; vars={vv})"


_BYTE_UNITS = {
    "B": 1,
    "KB": 10**3,
    "MB": 10**6,
    "GB": 10**9,
    "TB": 10**12,
    "PB": 10**15,
    "KIB": 2**10,
    "MIB": 2**20,
    "GIB": 2**30,
    "TIB": 2**40,
    "PIB": 2**50,
}


def parse_bytes(spec: str) -> int:
    """``'100MB'`` → 100_000_000 (reference accepts dask byte-strings,
    ``dataset.py:167-175``)."""
    s = spec.strip().upper().replace(" ", "")
    for unit in sorted(_BYTE_UNITS, key=len, reverse=True):
        if s.endswith(unit):
            return int(float(s[: -len(unit)]) * _BYTE_UNITS[unit])
    return int(float(s))


def dask_to_xbeam_chunks(
    dask_chunks: Mapping[str, tuple[int, ...]],
) -> dict[str, int]:
    """Convert dask-style per-dim chunk TUPLES (e.g. ``(3, 3, 3, 1)``) to
    scalar chunk sizes — every chunk must be equal except a smaller last
    (reference ``core.py:366-383``, same error messages; what a user
    migrating ``ds.chunks`` from dask/xarray hands us on day one)."""
    for dim, dim_chunks in dask_chunks.items():
        if len(dim_chunks) == 0:
            raise ValueError(f"dimension {dim!r} has an empty dask chunks tuple")
        if len(dim_chunks) > 1:
            if len(set(dim_chunks[:-1])) > 1:
                raise ValueError(
                    f"dimension {dim!r} has inconsistent dask chunks: "
                    f"{tuple(dim_chunks)}. All chunks except for the last must be equal."
                )
            if dim_chunks[-1] > dim_chunks[0]:
                raise ValueError(
                    f"dimension {dim!r} has dask chunks where the last chunk "
                    f"{dim_chunks[-1]} is larger than preceding chunks "
                    f"{dim_chunks[0]}: {tuple(dim_chunks)}."
                )
    return {k: v[0] for k, v in dask_chunks.items()}


def normalize_chunks(
    chunks: Mapping[str, int | str] | int | str,
    sizes: Mapping[str, int],
    itemsize: int | None = None,
) -> dict[str, int]:
    """Resolve ``-1``/oversized/byte-string chunk specs to concrete
    per-dim chunk sizes.

    Dims absent from ``chunks`` are unchunked (single chunk spanning the
    whole dim). A byte-string spec (``'100MB'``) for a dim resolves to
    the element count such that one chunk holds ~that many bytes given
    ``itemsize`` and the other dims' resolved chunk extents (reference:
    ``dataset.py:83-199``).

    Reference-parity surface (``dataset.py:130-175``): a bare int/str
    applies to every dim; an ``...`` key is the default for every dim
    not named explicitly; ``'auto'`` is rejected with the reference's
    explicit message (dask-only semantics — supply a byte count); a
    dask-style per-dim chunk TUPLE (``{'x': (3, 3, 3, 1)}``) is
    validated regular and collapsed via :func:`dask_to_xbeam_chunks`
    (reference ``core.py:366-383``)."""
    if isinstance(chunks, (int, str)):
        chunks = {dim: chunks for dim in sizes}
    chunks = dict(chunks)
    tuples = {d: c for d, c in chunks.items() if isinstance(c, (tuple, list))}
    if tuples:  # dask-style expanded chunks: validate + collapse to ints
        chunks.update(dask_to_xbeam_chunks(tuples))
    unknown = sorted(set(chunks) - set(sizes) - {...})
    if unknown:
        # checked BEFORE the ... expansion: rebuilding over sizes' dims
        # would silently discard a typo'd dim's spec and leave the real
        # dim unchunked (one whole-dim chunk — all parallelism lost)
        raise ValueError(f"chunks for unknown dimensions {unknown}; sizes has {sorted(sizes)}")
    if ... in chunks:
        default = chunks.pop(...)
        chunks = {dim: chunks.get(dim, default) for dim in sizes}
    if any(c == "auto" for c in chunks.values()):
        raise ValueError(
            "normalize_chunks() does not support 'auto' chunk sizes "
            "(dask-only semantics). Supply an explicit number of bytes "
            f"instead, e.g., '100MB'. Got chunks={chunks}"
        )
    out: dict[str, int] = {}
    pending: dict[str, str] = {}
    for dim, size in sizes.items():
        c = chunks.get(dim, -1)
        if isinstance(c, str):
            pending[dim] = c
            continue
        if c == -1 or c >= size:
            out[dim] = size
        elif c <= 0:
            raise ValueError(f"invalid chunk size {c} for dim {dim!r}")
        else:
            out[dim] = c
    if len(set(pending.values())) > 1:
        # the reference rejects this outright (dataset.py:146-150): two
        # distinct byte budgets over one grid have no consistent solution
        raise ValueError(
            f"cannot provide multiple distinct chunk sizes in bytes: {chunks}"
        )
    if pending:
        if itemsize is None:
            raise ValueError(
                f"byte-string chunk specs {pending} require itemsize"
            )
        # Joint resolution across all byte-spec dims (one shared budget):
        # fixed dims set the per-element cost, the remaining element
        # budget waterfills over the pending dims — small dims saturate
        # first, the rest split the leftover evenly in log space.
        target = parse_bytes(next(iter(pending.values())))
        per_element = max(1, itemsize)
        for c in out.values():
            per_element *= c
        budget = max(1, target // per_element)
        todo = sorted(pending, key=lambda d: sizes[d])
        while todo:
            share = max(1, int(budget ** (1.0 / len(todo))))
            dim = todo.pop(0)
            got = min(sizes[dim], share)
            out[dim] = got
            budget = max(1, budget // got)
    return out


def expand_chunks(chunk: int, size: int) -> tuple[int, ...]:
    """Per-chunk sizes along one dim; last may be smaller.

    ``expand_chunks(3, 10) == (3, 3, 3, 1)``. Reference semantics:
    ``core.py:386-416`` (normalize_expanded_chunks).
    """
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    full, rem = divmod(size, chunk)
    return (chunk,) * full + ((rem,) if rem else ())


def chunk_offsets_along(chunk: int, size: int) -> tuple[int, ...]:
    """Starting element offset of each chunk along one dim."""
    return tuple(range(0, size, chunk))


def chunk_count(chunks: Mapping[str, int], sizes: Mapping[str, int]) -> int:
    n = 1
    for dim, size in sizes.items():
        n *= math.ceil(size / chunks.get(dim, size))
    return n


def iter_chunk_keys(
    sizes: Mapping[str, int],
    chunks: Mapping[str, int],
    vars: frozenset[str] | None = None,
) -> Iterator[Key]:
    """All chunk Keys of a grid, in deterministic dim-sorted row-major order.

    Reference: ``core.py:341-351``. Driver-side this is only used for small
    grids; distributed enumeration goes through ``key_for_index``.
    """
    dims = sorted(sizes)
    per_dim = [chunk_offsets_along(chunks.get(d, sizes[d]), sizes[d]) for d in dims]
    for combo in itertools.product(*per_dim):
        yield Key.make(dict(zip(dims, combo)), vars)


def key_for_index(
    i: int, sizes: Mapping[str, int], chunks: Mapping[str, int]
) -> dict[str, int]:
    """Offsets of the i-th chunk (row-major over sorted dims).

    This is the distributed key-enumeration primitive: executors map a
    ``spark.range(chunk_count)`` index to a Key without any driver-side
    materialization (replaces the reference's 200k-task sharding machinery,
    ``core.py:544-670``).
    """
    dims = sorted(sizes)
    counts = [math.ceil(sizes[d] / chunks.get(d, sizes[d])) for d in dims]
    offsets: dict[str, int] = {}
    for dim, cnt in zip(reversed(dims), reversed(counts)):
        i, idx = divmod(i, cnt)
        offsets[dim] = idx * chunks.get(dim, sizes[dim])
    if i:
        raise IndexError("chunk index out of range")
    return offsets


def offsets_to_slices(
    offsets: Mapping[str, int],
    chunks: Mapping[str, int],
    sizes: Mapping[str, int],
) -> dict[str, slice]:
    """Element slices of the chunk at ``offsets`` in the global grid.

    Reference: ``core.py:289-329``.
    """
    out: dict[str, slice] = {}
    for dim, size in sizes.items():
        start = offsets.get(dim, 0)
        step = chunks.get(dim, size)
        out[dim] = slice(start, min(start + step, size))
    return out


def chunk_bounds_overlap(
    start: int, stop: int, target_chunk: int
) -> Iterator[tuple[int, int, int]]:
    """Split the element range [start, stop) on a global grid of
    ``target_chunk``-sized cells.

    Yields ``(grid_offset, lo, hi)``: the target chunk's global offset and
    the sub-range [lo, hi) of the input range that falls into it.
    Handles ranges not aligned to the grid (reference ``rechunk.py:374-397``).
    ``target_chunk == -1`` means "keep the whole range" (the reference's
    ``_split_chunk_bounds`` returns ``[(start, stop)]`` for ``multiple=-1``);
    other non-positive sizes raise rather than silently yielding nothing.
    """
    if target_chunk == -1:
        if start < stop:
            yield start, start, stop
        return
    if target_chunk <= 0:
        raise ValueError(
            f"target chunk size must be positive or -1, got {target_chunk}"
        )
    first = (start // target_chunk) * target_chunk
    for grid_off in range(first, stop, target_chunk):
        lo = max(start, grid_off)
        hi = min(stop, grid_off + target_chunk)
        if lo < hi:
            yield grid_off, lo, hi
