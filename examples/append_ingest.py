"""Time-series ingestion by append: grow one Zarr store day after day.

The operational shape most xarray/Zarr users run daily: a fixed archive
holds everything up to yesterday; each new day of data arrives and must
land WITHOUT rewriting (or even re-opening for write) the existing
extent. Two variants of the same store-growing machinery:

1. batch: ``to_zarr(ds_day, store, append_dim="time")`` per arriving
   slice — metadata-only shape resize, coordinate extension, one aligned
   region write at origin = old extent;
2. streaming: ``stream_append_to_zarr`` drives the same appends from a
   Structured Streaming ``foreachBatch`` sink with an order guard and a
   batch-id high-water marker (exactly-once under replays).

Run:  python examples/append_ingest.py [out.zarr]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import zarr_io


def _day_slice(day: int, nx: int = 48) -> NDDataset:
    """One arriving day: 24 hourly steps of a (time, x) field."""
    rng = np.random.default_rng(day)
    t0 = np.datetime64("2024-01-01", "h") + day * 24
    return NDDataset(
        data_vars={
            "temperature": (
                ("time", "x"),
                rng.normal(10 + day, 3, size=(24, nx)).astype(np.float32),
            )
        },
        coords={
            "time": (t0 + np.arange(24)).astype("datetime64[us]"),
            "x": np.arange(nx, dtype=np.int64),
        },
    )


def main(out: str = "/tmp/append_demo.zarr") -> None:
    spark = get_spark("append-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    # day 0 creates the store (24-step zarr chunks = one day per chunk,
    # so every later append lands on a chunk boundary by construction)
    first = Dataset.from_numpy(spark, _day_slice(0), chunks={"time": 24})
    zarr_io.to_zarr(first, out, zarr_chunks={"time": 24, "x": 48})
    print(f"created {out} with day 0")

    # days 1..4 arrive one at a time: each append is metadata resize +
    # coordinate extension + ONE distributed region write of 24 steps
    for day in range(1, 5):
        ds = Dataset.from_numpy(spark, _day_slice(day), chunks={"time": 24})
        stats = zarr_io.to_zarr(ds, out, append_dim="time")
        print(f"appended day {day}: {stats}")

    back = zarr_io.from_zarr(spark, out)
    nd = back.collect()
    tmin = np.asarray(nd.coords["time"].values).min()
    tmax = np.asarray(nd.coords["time"].values).max()
    print(f"final store: sizes={dict(back.sizes)} time=[{tmin} .. {tmax}]")
    assert back.sizes["time"] == 5 * 24
    print("append ingest OK — NDDataset round-trip verified")


if __name__ == "__main__":
    main(*sys.argv[1:])
