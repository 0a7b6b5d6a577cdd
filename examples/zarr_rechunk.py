"""Rechunk pipeline example (the reference's ``examples/xbeam_rechunk.py``
re-expressed Spark-first): read a Zarr store, move the chunk grid from
time-pancakes to space-pencils, write a new store.

On a pristine scan this compiles to a shuffle-free re-read (scan
rewrite); after any transform it becomes the planned multi-stage
split → shuffle → consolidate chain with every stage ≤ max_mem.

Run:  python examples/zarr_rechunk.py [in.zarr] [out.zarr]
(With no args, synthesizes a demo store first.)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.observability import get_counters
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import zarr_io


def _demo_store(spark, path: str) -> None:
    rng = np.random.default_rng(0)
    src = NDDataset(
        data_vars={
            "temperature": (
                ("time", "lat", "lon"),
                rng.normal(15, 8, size=(240, 36, 72)).astype(np.float32),
            )
        },
        coords={
            "time": (np.datetime64("2020-01-01", "h") + np.arange(240)).astype("datetime64[us]"),
            "lat": np.linspace(-87.5, 87.5, 36),
            "lon": np.linspace(0, 355, 72),
        },
    )
    # time-chunked (pancakes): the layout sensors write
    d = Dataset.from_numpy(spark, src, chunks={"time": 24})
    zarr_io.to_zarr(d, path, zarr_chunks={"time": 24})


def main(src_path: str | None = None, out: str = "/tmp/rechunked.zarr") -> None:
    spark = get_spark("zarr-rechunk")
    spark.sparkContext.setLogLevel("ERROR")
    if src_path is None:
        src_path = "/tmp/rechunk_demo_src.zarr"
    if not os.path.exists(src_path):
        # synthesize the demo source at whatever path was asked for —
        # callers (and the test) can point BOTH paths at a private tmp
        # dir instead of racing on shared /tmp stores
        _demo_store(spark, src_path)

    counters = get_counters(spark)
    counters.reset()
    ds = zarr_io.from_zarr(spark, src_path)
    print("source:", ds)
    # space-pencils: whole time series per (lat, lon) tile — the layout
    # time-series analysis wants
    pencils = ds.rechunk({"time": -1, "lat": 6, "lon": 12})
    stats = zarr_io.to_zarr(pencils, out, zarr_chunks={"time": -1, "lat": 6, "lon": 12})
    print(f"wrote {out}: {stats}")
    print("counters:", counters.snapshot())


if __name__ == "__main__":
    main(*sys.argv[1:])
