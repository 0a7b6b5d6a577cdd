"""Climatology pipeline example (the reference's flagship example,
``examples/era5_climatology.py``, re-expressed Spark-first).

Builds a dense (day × hour × event_type) activity grid from the long
``events`` table, computes the mean day-of-week climatology with one
narrow pre-aggregation + one shuffle, and writes the result to a Zarr v3
store.

Run:  python examples/events_climatology.py [sf_dir] [out.zarr]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import zarr_io
from xarray_beam_spark.tables import load


def main(sf_dir: str = "/root/testdata/sf0.001", out: str = "/tmp/events_climatology.zarr") -> None:
    spark = get_spark("events-climatology")
    spark.sparkContext.setLogLevel("ERROR")

    # long events table → dense grid of hourly counts
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.hour(F.col("ts")).cast("long").alias("hour"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    days = np.array(
        [r[0] for r in cells.select("day").distinct().orderBy("day").collect()],
        dtype="datetime64[us]",
    )
    etypes = np.array(sorted(r[0] for r in cells.select("event_type").distinct().collect()))
    grid = Dataset.from_table(
        cells,
        dims=["day", "hour", "event_type"],
        coords={"day": days, "hour": np.arange(24, dtype=np.int64), "event_type": etypes},
        var_cols=["cnt"],
        chunks={"day": 7},
    )

    # climatology: mean over days grouped by day-of-week (Sunday = 0)
    dow = (days.astype("datetime64[D]").view("int64") + 4) % 7
    clim = grid.groupby_reduce("day", dow, op="mean", new_dim="dow")

    stats = zarr_io.to_zarr(clim, out, zarr_format=3)
    print(f"wrote {out}: {stats}")
    print(zarr_io.from_zarr(spark, out).collect())


if __name__ == "__main__":
    main(*sys.argv[1:])
