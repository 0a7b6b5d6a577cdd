"""Per-micro-batch cost breakdown for the streaming Zarr gates.

VERDICT r9 #7: `stream_zarr_append` / `stream_zarr_tail` /
`stream_interval_join` hold 3 of the 5 most expensive bench slots every
round. This profiler answers the one question that matters at real store
sizes: is the per-batch cost a CONSTANT floor (Structured Streaming
machinery), or does any component grow with the store (re-listing,
coordinate rewrites)?

Three measurements:

1. **bare floor** — a no-op ``foreachBatch`` over the same 3-file staged
   feed (same trigger / checkpoint discipline): the irreducible
   per-micro-batch cost none of our code can remove.
2. **gate wall** — ``stream_append_to_zarr`` end-to-end, what bench sees.
3. **append scaling** — N back-to-back ``append_to_zarr`` calls into one
   growing store (no streaming machinery), each decomposed into
   driver-metadata seconds vs distributed-write seconds, plus store-seam
   op counts (get/put/exists/list_dir) per append. Any positive slope
   from the first to the last quartile is the component that scales with
   store extent.

Per `zarr_io.append_to_zarr` the only extent-dependent driver work is the
append-dim coordinate rewrite (read-full + write-full of an O(extent)
single-chunk array) — this script shows the measured size of that term.

Usage: python scripts/profile_stream.py [--appends 32] [--sf DIR]
Prints one JSON document.
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
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import stores, zarr_io


class _CountingStore(stores.FsStore):
    """FsStore with per-operation counters (driver-side seam only)."""

    ops = {"get": 0, "put": 0, "exists": 0, "list_dir": 0}
    bytes_rw = {"get": 0, "put": 0}

    def get(self, key):
        data = super().get(key)
        _CountingStore.ops["get"] += 1
        if data is not None:
            _CountingStore.bytes_rw["get"] += len(data)
        return data

    def put(self, key, data):
        _CountingStore.ops["put"] += 1
        _CountingStore.bytes_rw["put"] += len(data)
        return super().put(key, data)

    def exists(self, key):
        _CountingStore.ops["exists"] += 1
        return super().exists(key)

    def list_dir(self, key):
        _CountingStore.ops["list_dir"] += 1
        return super().list_dir(key)

    @classmethod
    def snapshot(cls):
        return dict(cls.ops), dict(cls.bytes_rw)


def _bare_floor(spark, sf_dir: str) -> dict:
    from xarray_beam_spark.streaming import events_stream as es
    from xarray_beam_spark.tables import load

    stage = es._staged_day_files(spark, sf_dir)
    raw_schema = load(spark, sf_dir, "events").schema
    batch_walls: list[float] = []
    last = [time.perf_counter()]

    def noop(batch_df, batch_id):
        batch_df.count()  # materialize the batch, write nothing
        now = time.perf_counter()
        batch_walls.append(now - last[0])
        last[0] = now

    ckpt = tempfile.mkdtemp(prefix="xbs_profile_floor_")
    t0 = time.perf_counter()
    q = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .writeStream.foreachBatch(noop)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "batches": len(batch_walls),
        "wall_s": round(wall, 2),
        "per_batch_s": [round(b, 2) for b in batch_walls],
    }


def _gate_wall(spark, sf_dir: str) -> float:
    from xarray_beam_spark.streaming import events_stream as es

    out = tempfile.mkdtemp(prefix="xbs_profile_gate_") + "/ingest.zarr"
    t0 = time.perf_counter()
    es.stream_append_to_zarr(spark, sf_dir, out)
    wall = time.perf_counter() - t0
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    return round(wall, 2)


def _append_scaling(spark, n_appends: int) -> dict:
    """Grow a store one day at a time; per append record metadata seconds
    (everything before the distributed write), write seconds, store ops."""
    work = tempfile.mkdtemp(prefix="xbs_profile_append_")
    out = os.path.join(work, "grow.zarr")
    hours = np.arange(24, dtype=np.int64)
    etypes = np.array(["click", "purchase", "signup", "view"])

    def day_grid(i: int) -> NDDataset:
        day0 = np.datetime64("2024-01-01", "us")
        vals = (np.arange(24 * 4, dtype=np.float64) + i).reshape(1, 24, 4)
        return NDDataset(
            {"cnt": (("day", "hour", "event_type"), vals)},
            coords={
                "day": np.array([day0 + np.timedelta64(i, "D")], "datetime64[us]"),
                "hour": hours,
                "event_type": etypes,
            },
        )

    # route this path through the counting seam
    orig_resolve = stores.resolve

    def counted_resolve(path):
        store, key = orig_resolve(path)
        if isinstance(store, stores.FsStore) and work in path:
            return _CountingStore(), key
        return store, key

    stores.resolve = counted_resolve
    orig_to_zarr = zarr_io.to_zarr
    write_s = [0.0]

    def timed_to_zarr(*a, **kw):
        t0 = time.perf_counter()
        r = orig_to_zarr(*a, **kw)
        write_s[0] = time.perf_counter() - t0
        return r

    rows = []
    try:
        zarr_io.to_zarr(
            Dataset.from_numpy(spark, day_grid(0), chunks={"day": 1}),
            out, zarr_chunks={"day": 1, "hour": 24, "event_type": 4},
        )
        zarr_io.to_zarr = timed_to_zarr
        for i in range(1, n_appends):
            ops0, by0 = _CountingStore.snapshot()
            t0 = time.perf_counter()
            zarr_io.append_to_zarr(
                Dataset.from_numpy(spark, day_grid(i), chunks={"day": 1}),
                out, append_dim="day",
            )
            total = time.perf_counter() - t0
            ops1, by1 = _CountingStore.snapshot()
            rows.append({
                "extent_days": i,
                "total_s": round(total, 3),
                "write_s": round(write_s[0], 3),
                "meta_s": round(total - write_s[0], 3),
                "ops": {k: ops1[k] - ops0[k] for k in ops1},
                "get_bytes": by1["get"] - by0["get"],
                "put_bytes": by1["put"] - by0["put"],
            })
    finally:
        zarr_io.to_zarr = orig_to_zarr
        stores.resolve = orig_resolve
        shutil.rmtree(work, ignore_errors=True)

    q = max(1, len(rows) // 4)
    first, last = rows[:q], rows[-q:]

    def avg(rs, key):
        return round(sum(r[key] for r in rs) / len(rs), 3)

    return {
        "appends": len(rows),
        "first_quartile": {
            "meta_s": avg(first, "meta_s"), "write_s": avg(first, "write_s"),
            "ops": first[0]["ops"], "get_bytes": first[0]["get_bytes"],
        },
        "last_quartile": {
            "meta_s": avg(last, "meta_s"), "write_s": avg(last, "write_s"),
            "ops": last[-1]["ops"], "get_bytes": last[-1]["get_bytes"],
        },
        "coord_rewrite_bytes_per_day": 8,  # one datetime64 element
        "per_append": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--appends", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark("xbs-profile-stream")
    spark.sparkContext.setLogLevel("ERROR")
    from xarray_beam_spark.shipping import ensure_shipped

    ensure_shipped(spark)

    doc = {
        "bare_floor": _bare_floor(spark, args.sf),
        "gate_wall_s": _gate_wall(spark, args.sf),
        "append_scaling": _append_scaling(spark, args.appends),
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
