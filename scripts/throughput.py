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
    args = ap.parse_args()

    spark = get_spark("xbs-throughput", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
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
        # distributed read → staged shuffle rechunk (pancakes → pencils) → write
        t0 = time.perf_counter()
        src_ds = zarr_io.from_zarr(spark, a)
        shuffled = Dataset.from_dataframe(
            spark, src_ds.df, src_ds.template, src_ds.chunks, validate=False
        )
        r = shuffled.rechunk({"time": nt, "y": 64, "x": 64})
        zarr_io.to_zarr(r, b, zarr_chunks={"time": nt, "y": 64, "x": 64}, compressor=None)
        t_rechunk = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_rows = zarr_io.from_zarr(spark, b).df.count()
        t_read = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "dataset_mb": round(mb, 1),
                    "cores": cores,
                    "rechunk_roundtrip_mb_s": round(mb / t_rechunk, 1),
                    "read_mb_s": round(mb / t_read, 1),
                    "rechunk_mb_s_per_core": round(mb / t_rechunk / cores, 2),
                    "chunks_out": n_rows,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
