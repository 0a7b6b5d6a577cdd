"""Piecewise profile of the xb_sql_zarr_insert gate (VERDICT r7 #3).

Run: python scripts/profile_insert.py   (defaults to sf0.1, local[32])

Committed findings (2026-08-15, idle host, best of 3):

  load(schema infer)   0.14 s   driver-side Python worker creating the
                                DataSource instance + schema()
  scan .count()        0.39 s   1 read partition -> 1 executor Python
                                worker round-trip (store is 3600 cells:
                                decode time ~0, all fixed cost)
  + shuffle (JVM key)  +0.0 s   whole-stage codegen, no Arrow hop
  + DataSource write   +0.6 s   4 writer tasks (one per day-chunk) + commit
  readback + count     0.55 s   load + 1 task round-trip
  setup_zarr           0.00 s   NOT the cost (r6 hypothesis ruled out)
  ------------------------------
  gate floor          ~1.6 s    five Python-worker round-trips + two jobs

Passing an explicit .schema() moves the 0.14 s from load() into the
first job (worker creation is lazy) — total unchanged; measured both.

Every component is CONSTANT in data size: at sf0.1 the store is 3600
cells, so the gate is ~100% per-hop overhead that amortizes to zero at
real scale. The library write path (Dataset.to_zarr, ~0.6 s) is faster
only because it skips the SQL surface this gate exists to certify.
There is no remaining data-proportional waste to remove.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.chdir(tempfile.mkdtemp(prefix="xbs_profins_"))
    sys.path.insert(0, REPO)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from xarray_beam_spark import grid_queries as gq
    from xarray_beam_spark.shipping import ensure_shipped
    from xarray_beam_spark.sources import spark_datasource, zarr_io

    ensure_shipped(spark)
    d = gq._events_grid(spark, sf, chunks={"day": 8})
    src = gq._materialized(
        spark, sf, "dsv2",
        lambda p: zarr_io.to_zarr(d, p, zarr_chunks={"day": 8, "hour": 6}),
        persistent=True,
    )
    spark_datasource.register(spark)
    spark.read.format("xbs_zarr").option("path", src).load().count()  # warm

    for it in range(3):
        t0 = time.monotonic()
        df = spark.read.format("xbs_zarr").option("path", src).load()
        t_load = time.monotonic() - t0
        t0 = time.monotonic()
        df.count()
        t_scan = time.monotonic() - t0

        p = tempfile.mkdtemp(prefix=f"insdst{it}_") + "/store"
        t0 = time.monotonic()
        zarr_io.setup_zarr(d.template, p, {"day": 8, "hour": 24, "event_type": 64})
        t_setup = time.monotonic() - t0
        t0 = time.monotonic()
        rows = spark.read.format("xbs_zarr").option("path", src).load()
        (
            spark_datasource.repartition_for_write(rows, p)
            .write.format("xbs_zarr")
            .option("path", p)
            .mode("append")
            .save()
        )
        t_write = time.monotonic() - t0
        t0 = time.monotonic()
        back = spark.read.format("xbs_zarr").option("path", p).load()
        n = back.where(~F.isnan("cnt")).count()
        t_read = time.monotonic() - t0
        print(
            f"load={t_load:.3f} scan={t_scan:.3f} setup={t_setup:.3f} "
            f"scan+shuffle+write={t_write:.3f} readback={t_read:.3f} rows={n}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
