"""Zarr → rechunk → Zarr throughput micro-benchmark.

Measures the self-imposed BASELINE.md target: sustain ≥ 25 MB/s per core
through a full read → staged-rechunk → write cycle (the reference's own
worker cost model assumes 25 MB/s/worker, ``combiners.py:240``).

The source store is synthesized driver-side with direct zarrlite writes
(not through Spark) so the measured path is exactly: distributed read →
split → shuffle → consolidate → distributed aligned write. Uncompressed
stores isolate the engine from codec speed on incompressible noise.

Usage: python scripts/throughput.py [--mb 1024] [--cpus N]
Prints one JSON line with MB/s figures.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import zarr_io, zarrlite


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=1024)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--max-mem", default="256MB",
        help="per-task memory cap for the whole-dim gather stage",
    )
    args = ap.parse_args()

    spark = get_spark("xbs-throughput", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from xarray_beam_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    cores = spark.sparkContext.defaultParallelism

    ny, nx = 512, 512
    nt = max(16, args.mb * 1_000_000 // 4 // (ny * nx))
    t_chunk = max(1, nt // (2 * cores))
    work = tempfile.mkdtemp(prefix="xbs_throughput_")
    a, b = os.path.join(work, "a"), os.path.join(work, "b")

    # synthesize source store driver-side (time-pancake layout)
    zarrlite.create_group(a)
    meta = zarrlite.create_array(
        a, "v", (nt, ny, nx), (t_chunk, ny, nx), np.float32,
        ("time", "y", "x"), compressor=None,
    )
    rng = np.random.default_rng(0)
    for off in range(0, nt, t_chunk):
        block = rng.normal(size=(min(t_chunk, nt - off), ny, nx)).astype(np.float32)
        zarrlite.write_region(meta, {"time": off}, block)
    nbytes = meta.nbytes
    mb = nbytes / 1e6

    try:
        load0 = os.getloadavg()[0]

        # Warm the JVM (codegen, shuffle machinery, Python worker pool)
        # with a miniature cycle so the measured stages aren't dominated
        # by one-time startup: first-run vs warm differs ~3x.
        wpath = os.path.join(work, "warm")
        zarrlite.create_group(wpath)
        wmeta = zarrlite.create_array(
            wpath, "v", (64, ny, nx), (8, ny, nx), np.float32,
            ("time", "y", "x"), compressor=None,
        )
        zarrlite.write_region(wmeta, {"time": 0}, rng.normal(size=(64, ny, nx)).astype(np.float32))
        wsrc = zarr_io.from_zarr(spark, wpath)
        wds = Dataset.from_dataframe(spark, wsrc.df, wsrc.template, wsrc.chunks, validate=False)
        zarr_io.to_zarr(
            wds.rechunk({"time": 64, "y": 64, "x": 64}),
            os.path.join(work, "warm_out"),
            zarr_chunks={"time": 64, "y": 64, "x": 64},
            compressor=None,
        )

        def fresh():
            src_ds = zarr_io.from_zarr(spark, a)
            # break the scan spec so rechunk can't elide the shuffle
            return Dataset.from_dataframe(
                spark, src_ds.df, src_ds.template, src_ds.chunks, validate=False
            )

        # stage 1: read only (decode + count)
        t0 = time.perf_counter()
        fresh().df.count()
        t_read_src = time.perf_counter() - t0

        # stage 2: read + full shuffle rechunk (pancakes → pencils), no write
        t0 = time.perf_counter()
        r = fresh().rechunk({"time": nt, "y": 64, "x": 64})
        r.df.count()
        t_read_rechunk = time.perf_counter() - t0

        # stage 3: full cycle read → rechunk → distributed aligned write
        t0 = time.perf_counter()
        r2 = fresh().rechunk({"time": nt, "y": 64, "x": 64})
        zarr_io.to_zarr(r2, b, zarr_chunks={"time": nt, "y": 64, "x": 64}, compressor=None)
        t_full = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_rows = zarr_io.from_zarr(spark, b).df.count()
        t_read_back = time.perf_counter() - t0

        # stage 5: whole-dim gather along the BIG dim under a hard
        # per-task memory cap — the `_gather_dim` auto-split guard under
        # load. Every post-gather chunk spans the full time axis; the
        # other dims are auto-halved until a chunk fits --max-mem, so the
        # stage must complete with bounded tasks, never one giant reducer.
        from xarray_beam_spark import core as xbs_core
        from xarray_beam_spark.plans import rechunk_plan

        max_mem = xbs_core.parse_bytes(args.max_mem)
        g = fresh()
        gt = rechunk_plan.gather_dim_chunks(
            g.sizes, g.chunks, "time", 4, max_mem
        )
        planned_chunk_bytes = 4
        for d, c in gt.items():
            planned_chunk_bytes *= min(c, g.sizes[d])
        t0 = time.perf_counter()
        gathered = g._gather_dim("time", max_mem=max_mem)
        n_gathered = gathered.df.count()
        t_gather = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "dataset_mb": round(mb, 1),
                    "cores": cores,
                    "loadavg_start": round(load0, 1),
                    "loadavg_end": round(os.getloadavg()[0], 1),
                    "read_src_mb_s": round(mb / t_read_src, 1),
                    "read_rechunk_mb_s": round(mb / t_read_rechunk, 1),
                    "full_cycle_mb_s": round(mb / t_full, 1),
                    "read_back_mb_s": round(mb / t_read_back, 1),
                    "full_cycle_mb_s_per_core": round(mb / t_full / cores, 2),
                    "stage_seconds": {
                        "read": round(t_read_src, 2),
                        "rechunk_extra": round(t_read_rechunk - t_read_src, 2),
                        "write_extra": round(t_full - t_read_rechunk, 2),
                    },
                    "chunks_out": n_rows,
                    "gather_max_mem_mb": round(max_mem / 1e6, 1),
                    "gather_planned_chunk_mb": round(planned_chunk_bytes / 1e6, 1),
                    "gather_chunks": n_gathered,
                    "gather_mb_s": round(mb / t_gather, 1),
                    "gather_seconds": round(t_gather, 2),
                }
            )
        )
        assert planned_chunk_bytes <= max_mem, "gather guard exceeded max_mem"
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
