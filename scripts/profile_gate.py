"""Profile the driver-style correctness gate: per-query Spark + oracle timing.

Usage: python scripts/profile_gate.py [--sf SF_DIR]
Prints one line per query: name, spark_sec, oracle_sec, rows; then totals.
Registry order (the order the driver iterates).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    os.chdir(tempfile.mkdtemp(prefix="xbs_prof_"))
    sys.path.insert(0, REPO)

    import duckdb
    from pyspark.sql import SparkSession

    t0 = time.monotonic()
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"session: {time.monotonic() - t0:.2f}s", flush=True)

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs, osql = E.queries(), E.oracle_sql()
    tot_s = tot_o = 0.0
    rows_per = []
    for name in qs:  # registry order == driver order
        t1 = time.monotonic()
        try:
            got = qs[name](spark, args.sf).toPandas()
            n = len(got)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:36s} ERROR {repr(exc)[:120]}", flush=True)
            continue
        ts = time.monotonic() - t1
        t2 = time.monotonic()
        if name in osql:
            con.execute(osql[name]).df()
        to = time.monotonic() - t2
        tot_s += ts
        tot_o += to
        rows_per.append((ts + to, name))
        print(f"{name:36s} spark={ts:7.2f}s oracle={to:6.2f}s rows={n}", flush=True)
    print(f"\nTOTAL spark={tot_s:.1f}s oracle={tot_o:.1f}s all={tot_s + tot_o:.1f}s "
          f"wall={time.monotonic() - t0:.1f}s")
    rows_per.sort(reverse=True)
    print("slowest:", ", ".join(f"{n}={t:.1f}s" for t, n in rows_per[:12]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
