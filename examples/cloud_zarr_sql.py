"""A "cloud" Zarr store both ways: blosc chunks, HTTP backend, SQL pushdown.

The reference's headline use case is analytics over published cloud Zarr
stores (Pangeo/ERA5-style: blosc- or zstd-compressed chunks behind an
object store, reached via fsspec, ``zarr.py:71-96,374-386``). This
example runs that shape end to end — INCLUDING the publish step — with
this engine's own machinery:

1. publish a store OVER HTTP: ``to_zarr`` against an ``http://`` URL —
   the metadata skeleton is staged locally and pushed 128-wide
   (``setup_zarr(stage_locally)``), then executors PUT their
   blosc-compressed chunks directly to the object store (a throwaway
   local HTTP server with object-store PUT semantics stands in for any
   S3/GCS/HTTPS endpoint);
2. open it by ``http://`` URL: the driver fetches ``.zmetadata`` in ONE
   request (no listing — object stores have none worth using), executors
   GET only their chunks, 16 IO threads per task hiding request latency;
3. run plain Spark SQL against it through the ``xbs_zarr`` DataSource —
   the WHERE clause prunes store chunks via pushFilters before any chunk
   byte moves;
4. cross-check the SQL aggregate against the library-path read.

Run:  python examples/cloud_zarr_sql.py [store_dir]
"""

from __future__ import annotations

import functools
import http.server
import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.observability import get_counters
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import spark_datasource, zarr_io


class _PutHandler(http.server.SimpleHTTPRequestHandler):
    """Static file serving + object-store-shaped PUT (atomic replace)."""

    def log_message(self, *args):
        pass

    def do_PUT(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        target = self.translate_path(self.path)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        tmp = f"{target}.put.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, target)
        self.send_response(201)
        self.send_header("Content-Length", "0")
        self.end_headers()


def _publish(spark, path: str) -> None:
    """Write a blosc-lz4 store the way a data publisher would — here
    straight to the object store URL (staged setup + executor PUTs)."""
    rng = np.random.default_rng(42)
    nd = NDDataset(
        data_vars={
            "t2m": (
                ("time", "lat"),
                np.cumsum(rng.normal(0, 0.5, size=(96, 18)), axis=0).astype(np.float32)
                + 15.0,
            )
        },
        coords={
            "time": (np.datetime64("2024-06-01", "h") + np.arange(96)).astype(
                "datetime64[us]"
            ),
            "lat": np.linspace(-85.0, 85.0, 18),
        },
    )
    zarr_io.to_zarr(
        Dataset.from_numpy(spark, nd, chunks={"time": 24}),
        path,
        zarr_chunks={"time": 24},
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    )  # setup consolidates .zmetadata itself (staged when remote)


def main(store_dir: str | None = None) -> None:
    spark = get_spark("cloud-zarr-sql")
    spark.sparkContext.setLogLevel("ERROR")
    root = store_dir or tempfile.mkdtemp(prefix="xbs_cloud_")
    handler = functools.partial(_PutHandler, directory=root)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/era.zarr"
    print("publishing over http:", url)
    _publish(spark, url)  # staged metadata push + executor chunk PUTs

    try:
        counters = get_counters(spark)
        counters.reset()

        # library path: lazy distributed read over HTTP
        ds = zarr_io.from_zarr(spark, url)
        print("opened over http:", dict(ds.sizes))
        lib_mean = (
            ds.to_table(dropna=True)
            .where(F.col("time") >= "2024-06-03")
            .agg(F.avg("t2m").alias("m"))
            .collect()[0]["m"]
        )

        # SQL path: pushdown prunes the first two day-chunks entirely
        spark_datasource.register(spark)
        cells = spark.read.format("xbs_zarr").option("path", url).load()
        row = (
            cells.where(F.col("time") >= "2024-06-03")
            .groupBy()
            .agg(F.avg("t2m").alias("m"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        print(f"sql over http: mean t2m = {row['m']:.4f} over {row['n']} cells")
        assert abs(row["m"] - lib_mean) < 1e-9, (row["m"], lib_mean)
        print("library path agrees:", f"{lib_mean:.4f}")
        print("read counters:", counters.snapshot())
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
