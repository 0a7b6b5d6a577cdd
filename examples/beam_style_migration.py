"""An xarray-beam pipeline ported LINE BY LINE via the compat shims.

The reference's canonical example shape (``examples/era5_climatology.py``
there) is::

    with beam.Pipeline() as p:
        p | xbeam.DatasetToChunks(ds, {'time': 24})
          | xbeam.SplitChunks({'time': 1})
          | ...rechunk / reduce...
          | xbeam.ChunksToZarr(out)

This engine keeps the pipeline state on the lazy Spark ``Dataset``
instead of a Beam PCollection, but ``xarray_beam_spark.compat`` makes the
SPELLING identical: every reference top-level transform pipes with ``|``.
The script runs the same climatology-to-Zarr pipeline twice — once in
Beam spelling, once with native method chaining — and asserts the stores
agree bit for bit.

Run:  python examples/beam_style_migration.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xarray_beam_spark as xbs
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import zarr_io


def _era5_like(n_days: int = 8, nx: int = 16, ny: int = 12) -> NDDataset:
    rng = np.random.default_rng(42)
    nt = n_days * 24
    return NDDataset(
        data_vars={
            "t2m": (
                ("time", "y", "x"),
                (rng.normal(280, 8, size=(nt, ny, nx))).astype(np.float32),
            )
        },
        coords={
            "time": np.arange(nt, dtype=np.int64),
            "y": np.arange(ny, dtype=np.int64),
            "x": np.arange(nx, dtype=np.int64),
        },
        attrs={"source": "synthetic-era5-like"},
    )


def main(out_dir: str = "/tmp/beam_migration") -> None:
    spark = get_spark("beam-style-migration")
    spark.sparkContext.setLogLevel("ERROR")
    nd = _era5_like()
    beam_out = os.path.join(out_dir, "beam_spelling.zarr")
    native_out = os.path.join(out_dir, "native.zarr")

    # --- the reference spelling, shimmed -------------------------------
    stats = (
        nd
        | xbs.DatasetToChunks(spark, {"time": 24})
        | xbs.SplitChunks({"time": 12})
        | xbs.ValidateEachChunk()
        | xbs.Rechunk({"time": 48})
        | xbs.Mean("time")
        | xbs.ChunksToZarr(beam_out, zarr_chunks={"y": 6})
    )
    print(f"beam-spelling pipeline wrote {stats} to {beam_out}")

    # --- the same pipeline, native method chaining ----------------------
    native = (
        xbs.Dataset.from_numpy(spark, nd, chunks={"time": 24})
        .split_chunks({"time": 12})
        .validate()
        .rechunk({"time": 48})
        .mean("time")
    )
    zarr_io.to_zarr(native, native_out, zarr_chunks={"y": 6})

    a = zarr_io.from_zarr(spark, beam_out).collect()
    b = zarr_io.from_zarr(spark, native_out).collect()
    assert a.identical(b), "beam spelling diverged from the native chain"
    want = np.nanmean(np.asarray(nd.data_vars["t2m"].values, np.float64), axis=0)
    np.testing.assert_allclose(np.asarray(a.data_vars["t2m"].values, np.float64), want, rtol=1e-6)
    tmpl, chunks = xbs.open_zarr(beam_out)
    print(f"round-trip store: sizes={dict(tmpl.sizes)} chunks={chunks}")
    print("beam-style migration OK — spellings agree bit for bit")


if __name__ == "__main__":
    main(*sys.argv[1:])
