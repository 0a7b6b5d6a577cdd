"""Round-16 probe: where does the DSv2 Python-planner floor actually go?

Decomposes xb_sql_zarr_insert / xb_sql_on_zarr / stream_zarr_tail into
planner hops + jobs, and checks whether the driver-side Python planner
workers are REUSED across hops (spark.python.worker.reuse) by sampling
live python worker PIDs between timed phases.

Run: python scripts/profile_dsv2_r16.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker_pids() -> set[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,cmd"], capture_output=True, text=True
    ).stdout
    pids = set()
    for line in out.splitlines():
        if "pyspark.daemon" in line or "pyspark.sql.worker" in line or (
            "python" in line and "worker" in line and "pyspark" in line
        ):
            try:
                pids.add(int(line.split(None, 1)[0]))
            except ValueError:
                pass
    return pids


def main() -> int:
    os.chdir(tempfile.mkdtemp(prefix="xbs_profdsv2_"))
    sys.path.insert(0, REPO)

    from pyspark.sql import functions as F

    from xarray_beam_spark.session import get_spark

    spark = get_spark("xbs-prof-dsv2")
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
        params="zarr_chunks=day:8,hour:6",
    )
    spark_datasource.register(spark)

    def phase(label, fn):
        p0 = worker_pids()
        t0 = time.monotonic()
        r = fn()
        dt = time.monotonic() - t0
        p1 = worker_pids()
        new = len(p1 - p0)
        print(f"  {label:34s} {dt*1000:8.1f} ms  (+{new} worker pids)", flush=True)
        return r

    # warm one full cycle
    spark.read.format("xbs_zarr").option("path", src).load().count()

    for it in range(3):
        print(f"--- iter {it}")
        df = phase("load (create+schema)", lambda: spark.read.format("xbs_zarr").option("path", src).load())
        phase("noop (pushdown+plan+1 job)", lambda: df.write.format("noop").mode("overwrite").save())
        df2 = phase("load #2 same path", lambda: spark.read.format("xbs_zarr").option("path", src).load())
        phase("filter+agg noop", lambda: (
            df2.where((F.col("hour") >= 6) & (F.col("hour") < 18))
            .where(~F.isnan("cnt"))
            .groupBy("day", "event_type")
            .agg(F.sum(F.col("cnt").cast("long")).alias("total"))
            .write.format("noop").mode("overwrite").save()
        ))
        # write path decomposition
        p = tempfile.mkdtemp(prefix=f"insdst{it}_") + "/store"
        phase("setup_zarr", lambda: zarr_io.setup_zarr(
            d.template, p, {"day": 8, "hour": 24, "event_type": 64}))
        rows = spark.read.format("xbs_zarr").option("path", src).load()
        rp = phase("repartition_for_write (plan)", lambda: spark_datasource.repartition_for_write(rows, p))
        phase("dsv2 write (save)", lambda: (
            rp.write.format("xbs_zarr").option("path", p).mode("append").save()
        ))
        back = spark.read.format("xbs_zarr").option("path", p).load()
        phase("readback noop", lambda: back.where(~F.isnan("cnt")).write.format("noop").mode("overwrite").save())
    print("total worker pids live:", len(worker_pids()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
