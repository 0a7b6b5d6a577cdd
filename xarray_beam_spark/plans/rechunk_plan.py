"""Multistage rechunk planning (pure math, no Spark).

Problem (same as the reference's planner, ``xarray_beam/_src/
rechunker_algorithm.py`` — itself derived from the public pangeo
rechunker): moving a chunk grid from ``source_chunks`` to
``target_chunks`` in ONE shuffle can require a single reducer to gather
``prod(ceil(target_d / source_d))`` source chunks; at extreme ratios
(e.g. time-pancakes → space-pencils on a 100 TB grid) that is millions of
inputs into one task. Splitting the move into N stages with geometrically
interpolated intermediate chunk shapes bounds every stage's fan-in/out at
the N-th root of the total ratio, at the cost of N shuffles.

This is a fresh implementation: we choose the smallest N whose worst
per-stage gather stays under ``max_fan_bytes`` (default 1 GiB, matching
the reference's ``max_mem`` envelope, ``rechunk.py:541``), with
intermediate chunks kept ≥ ``min_mem`` where possible.
"""

from __future__ import annotations

import math
from typing import Mapping

DEFAULT_MAX_MEM = 2**30  # 1 GiB per consolidated group, like the reference
MAX_STAGES = 100

# Spark-shuffle cost model constants (relative weights, not wall-clock
# promises). The reference's planner minimizes elementary IO regions
# because its rechunker MATERIALIZES every stage to an intermediate Zarr
# store, where each region is a storage op (rechunker_algorithm.py:170-213).
# A Spark stage instead streams pieces through one shuffle: an extra stage
# re-copies the ENTIRE dataset through two Arrow hops + shuffle files
# (~300 MB/s measured end-to-end on local[32], scripts/throughput.py),
# while one extra shuffle record costs only its serialization overhead
# (~0.1 ms). One region is therefore worth ~30 KB of byte movement —
# stages only pay for themselves against region counts in the millions
# (degenerate pancake↔pencil moves), not the thousands.
C_BYTE = 1.0 / (300 * 1024 * 1024)  # seconds per byte moved per stage
C_REC = 1e-4  # seconds per elementary region (shuffle-record overhead)
C_STAGE = 0.5  # fixed per-stage scheduling cost (reference: combiners.py:241)


def chunk_nbytes(chunks: Mapping[str, int], itemsize: int) -> int:
    n = itemsize
    for s in chunks.values():
        n *= s
    return n


def gather_dim_chunks(
    sizes: Mapping[str, int],
    chunks: Mapping[str, int],
    dim: str,
    itemsize: int,
    max_mem: int = DEFAULT_MAX_MEM,
) -> dict[str, int]:
    """Target grid for a whole-dim gather: ``dim`` becomes one chunk,
    other dims keep their current chunking — auto-split (largest halved
    first) until the gathered chunk fits ``max_mem``. Pure math, shared
    by :meth:`Dataset._gather_dim` and its Hypothesis coverage.

    Raises when even 1-element chunks on every other dim cannot fit:
    a single series along ``dim`` is the irreducible unit the per-series
    ops (cumsum/rank/sortby/...) need in one task.
    """
    tgt = {d: min(chunks.get(d, sizes[d]), sizes[d]) for d in sizes}
    tgt[dim] = sizes[dim]
    floor = sizes[dim] * itemsize
    if floor > max_mem:
        raise ValueError(
            f"gathering {dim!r} ({sizes[dim]} elements, itemsize {itemsize}) "
            f"into one contiguous chunk needs >= {floor} bytes even with "
            f"every other dimension split to 1-element chunks, exceeding "
            f"max_mem={max_mem}. Raise max_mem, shrink the dim first "
            f"(isel/coarsen/resample), or restate the op so it does not "
            f"need the whole dim in one task."
        )
    while chunk_nbytes(tgt, itemsize) > max_mem:
        d = max((o for o in tgt if o != dim and tgt[o] > 1), key=lambda o: tgt[o])
        tgt[d] = tgt[d] // 2  # > 1 before halving, so stays >= 1
    return tgt


def stage_gather_bytes(
    from_chunks: Mapping[str, int], to_chunks: Mapping[str, int], itemsize: int
) -> int:
    """Worst-case bytes gathered by one consolidate group in a stage.

    A target chunk along dim d overlaps at most ``ceil(to/from) + 1``
    source chunks when unaligned; the gathered payload is bounded by the
    target chunk volume plus one source-chunk halo per dim.
    """
    total = itemsize
    for d, to in to_chunks.items():
        frm = from_chunks.get(d, to)
        total *= min(to + frm, to + to)  # halo bound, never more than 2x
    return total


def _geom_interp(a: int, b: int, frac: float) -> int:
    """Geometric interpolation between two chunk sizes, ≥1, integer."""
    if a == b:
        return a
    val = a * (b / a) ** frac
    return max(1, int(round(val)))


def _snap(value: int, source: int, target: int, size: int) -> int:
    """Snap an intermediate chunk size to a multiple of whichever endpoint
    divides it best, to maximize split/consolidate elision downstream."""
    value = min(value, size)
    for base in sorted({source, target}):
        if base <= 0:
            continue
        mult = max(1, round(value / base))
        snapped = base * mult
        if snapped <= size and abs(snapped - value) <= max(base // 2, 1):
            return snapped
    return value


def stage_io_ops(
    sizes: Mapping[str, int], from_chunks: Mapping[str, int], to_chunks: Mapping[str, int]
) -> int:
    """Elementary read+write regions of one rechunk round: per dim, the
    union of both boundary grids has ``ceil(s/a) + ceil(s/b) -
    ceil(s/lcm(a,b))`` intervals (boundaries coincide at lcm multiples);
    the stage's region count is their product — the lcm IO-op model of
    the reference planner (``rechunker_algorithm.py:170-213``, after the
    pangeo rechunker), which the plan search minimizes across stages."""
    total = 1
    for d, s in sizes.items():
        a = from_chunks.get(d, s)
        b = to_chunks.get(d, s)
        lcm = a // math.gcd(a, b) * b
        total *= -(-s // a) + -(-s // b) - -(-s // lcm)
    return total


def plan_io_ops(sizes: Mapping[str, int], seq: list[dict[str, int]]) -> int:
    return sum(stage_io_ops(sizes, a, b) for a, b in zip(seq, seq[1:]))


def plan_cost(sizes: Mapping[str, int], seq: list[dict[str, int]], itemsize: int) -> float:
    """Estimated cost of a ladder under the Spark-shuffle model: every
    stage moves the whole dataset (bytes × C_BYTE + C_STAGE) and each
    elementary region pays one record overhead (C_REC)."""
    total_bytes = itemsize
    for s in sizes.values():
        total_bytes *= s
    n_stages = len(seq) - 1
    return (
        n_stages * (total_bytes * C_BYTE + C_STAGE)
        + plan_io_ops(sizes, seq) * C_REC
    )


def plan_stages(
    sizes: Mapping[str, int],
    source_chunks: Mapping[str, int],
    target_chunks: Mapping[str, int],
    itemsize: int,
    max_mem: int = DEFAULT_MAX_MEM,
    min_mem: int | None = None,
) -> list[dict[str, int]]:
    """Return the full chunk-grid sequence ``[source, i1, ..., target]``.

    Each consecutive pair is one split→shuffle→consolidate round. Among
    the geometric-interpolation ladders whose every round's worst-case
    gather fits ``max_mem`` (or the irreducible single-target-chunk cost),
    pick the cheapest under the Spark-shuffle cost model (``plan_cost``):
    per-stage whole-dataset copy + per-region record overhead. The lcm
    region count (reference ``rechunker_algorithm.py:170-213``) survives
    as the C_REC term, but — unlike the reference, whose stages
    materialize to intermediate Zarr stores — a Spark stage is a streamed
    shuffle, so extra stages are expensive and small records are cheap:
    direct single-shuffle plans win except on degenerate region-count
    explosions (e.g. (1,N)→(N,1) moves).

    ``min_mem`` (default ``max_mem // 100``): floor on intermediate chunk
    payloads (reference ``rechunk.py:562-563``) — ladders that pass
    through chunks tinier than the floor are rejected, preventing
    pathological many-tiny-chunk intermediates on adversarial shapes.
    """
    dims = sorted(sizes)
    src = {d: min(source_chunks.get(d, sizes[d]), sizes[d]) for d in dims}
    tgt = {d: min(target_chunks.get(d, sizes[d]), sizes[d]) for d in dims}
    if src == tgt:
        return [src]
    if min_mem is None:
        min_mem = max_mem // 100
    # the endpoints themselves bound what any intermediate can promise
    mem_floor = min(min_mem, chunk_nbytes(src, itemsize), chunk_nbytes(tgt, itemsize))
    gather_floor = stage_gather_bytes(tgt, tgt, itemsize)  # irreducible target cost

    best: list[dict[str, int]] | None = None
    best_cost = 0.0
    first_feasible: int | None = None
    for n_stages in range(1, MAX_STAGES + 1):
        seq = [src]
        for k in range(1, n_stages):
            frac = k / n_stages
            mid = {
                d: _snap(_geom_interp(src[d], tgt[d], frac), src[d], tgt[d], sizes[d])
                for d in dims
            }
            seq.append(mid)
        seq.append(tgt)
        fits_mem = max(
            stage_gather_bytes(a, b, itemsize) for a, b in zip(seq, seq[1:])
        ) <= max(max_mem, gather_floor)
        fits_floor = all(chunk_nbytes(s, itemsize) >= mem_floor for s in seq[1:-1])
        if fits_mem and fits_floor:
            # Drop consecutive duplicates (snapping can collapse stages).
            out = [seq[0]]
            for s in seq[1:]:
                if s != out[-1]:
                    out.append(s)
            cost = plan_cost(sizes, out, itemsize)
            if best is None or cost < best_cost:
                best, best_cost = out, cost
            if first_feasible is None:
                first_feasible = n_stages
        # adding stages strictly increases copies once feasible; search a
        # small window past the first feasible ladder, then stop
        if first_feasible is not None and n_stages >= first_feasible + 4:
            break
    if best is not None:
        return best
    raise ValueError(
        f"cannot plan rechunk {src} -> {tgt} within {max_mem} bytes in {MAX_STAGES} stages"
    )


def needs_split(from_chunks: Mapping[str, int], to_chunks: Mapping[str, int]) -> bool:
    """A narrow split pass is skippable when every target chunk size is a
    multiple of the source (reference elision: ``rechunk.py:503-517``).
    A dim absent from ``to_chunks`` keeps its source chunk (no-op)."""
    return any(to_chunks.get(d, c) % c != 0 for d, c in from_chunks.items() if c)


def needs_consolidate(from_chunks: Mapping[str, int], to_chunks: Mapping[str, int]) -> bool:
    """The shuffle+combine pass is skippable when every source chunk size
    is a multiple of the target (pure splitting).  A dim absent from
    ``to_chunks`` keeps its source chunk (no-op)."""
    return any(c % to_chunks.get(d, c) != 0 for d, c in from_chunks.items() if to_chunks.get(d, c))
