"""HTTP(S) object-store backend + in-task IO threading.

The reference reaches cloud stores via fsspec and hides their request
latency by threading per-variable/per-chunk IO inside each task
(``zarr.py:374-386``, ``core.py:528-530``, ``threadmap.py:111``); these
tests prove the same seam end-to-end: a Zarr group written to local disk
is served by a throwaway ``http.server`` and read back through
``http://`` paths (consolidated metadata → no listing needed), and a
latency-injected store shows the threaded chunk reads overlapping."""

from __future__ import annotations

import functools
import http.server
import threading
import time

import numpy as np
import pytest

from xarray_beam_spark.sources import iothread, stores, zarrlite


REQUEST_LOG: list[str] = []


class _LoggingHandler(http.server.SimpleHTTPRequestHandler):
    def log_message(self, *args):  # silence per-request stderr noise
        pass

    def do_GET(self):
        REQUEST_LOG.append(self.path)
        super().do_GET()

    def do_HEAD(self):
        REQUEST_LOG.append(self.path)
        super().do_HEAD()


@pytest.fixture()
def http_root(tmp_path):
    handler = functools.partial(_LoggingHandler, directory=str(tmp_path))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    REQUEST_LOG.clear()
    try:
        yield str(tmp_path), f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


def _write_store(local_path: str) -> np.ndarray:
    rng = np.random.default_rng(5)
    data = rng.normal(size=(12, 8))
    zarrlite.create_group(local_path, {"title": "http"})
    meta = zarrlite.create_array(
        local_path, "v", shape=(12, 8), chunks=(4, 8), dtype="<f8",
        dims=("t", "x"), compressor={"id": "blosc", "cname": "lz4", "shuffle": 1},
    )
    zarrlite.write_full(meta, data)
    zarrlite.consolidate_metadata(local_path)
    return data


class TestHttpStore:
    def test_group_read_over_http(self, http_root):
        local, url = http_root
        data = _write_store(f"{local}/grp")
        arrays, attrs = zarrlite.open_group(f"{url}/grp")
        assert attrs["title"] == "http"
        np.testing.assert_array_equal(zarrlite.read_full(arrays["v"]), data)
        # region read crossing a chunk boundary
        np.testing.assert_array_equal(
            zarrlite.read_region(arrays["v"], {"t": 2, "x": 1}, {"t": 6, "x": 5}),
            data[2:8, 1:6],
        )

    def test_missing_chunk_reads_fill(self, http_root):
        local, url = http_root
        zarrlite.create_group(f"{local}/partial")
        zarrlite.create_array(
            f"{local}/partial", "v", shape=(4,), chunks=(2,), dtype="<f8",
            dims=("x",),
        )
        zarrlite.consolidate_metadata(f"{local}/partial")
        arrays, _ = zarrlite.open_group(f"{url}/partial")
        got = zarrlite.read_full(arrays["v"])  # no chunk files → all fill
        assert np.isnan(got).all()

    def test_http_store_is_read_only(self, http_root):
        _, url = http_root
        store, key = stores.resolve(f"{url}/x")
        assert store.latency_bound
        with pytest.raises(NotImplementedError, match="read-only"):
            store.put(key, b"nope")

    def test_exists_and_404(self, http_root):
        local, url = http_root
        _write_store(f"{local}/g2")
        store, key = stores.resolve(f"{url}/g2/.zgroup")
        assert store.exists(key)
        store2, key2 = stores.resolve(f"{url}/g2/.nothere")
        assert not store2.exists(key2)
        assert store2.get(key2) is None


class _SlowStore(stores.Store):
    """Latency-injecting wrapper: every get pays a fixed sleep — the
    shape of object-store request latency."""

    latency_bound = True

    def __init__(self, inner: stores.Store, delay: float):
        self.inner = inner
        self.delay = delay

    def get(self, key):
        time.sleep(self.delay)
        return self.inner.get(key)

    def put(self, key, data):
        self.inner.put(key, data)

    def exists(self, key):
        return self.inner.exists(key)

    def list_dir(self, key):
        return self.inner.list_dir(key)


class TestIoThreading:
    def test_thread_map_order_and_nesting(self):
        def outer(i):
            tid = threading.get_ident()
            inner = iothread.thread_map(
                lambda j: (i, j, threading.get_ident()), range(3), 8
            )
            return tid, inner

        res = iothread.thread_map(outer, range(5), 8)
        for i, (tid, inner) in enumerate(res):
            assert [(a, b) for a, b, _ in inner] == [(i, j) for j in range(3)]
            # nested level degraded to the serial loop in the same thread
            assert all(t == tid for _, _, t in inner)

    def test_thread_map_propagates_errors(self):
        def boom(i):
            if i == 3:
                raise RuntimeError("x")
            return i

        with pytest.raises(RuntimeError, match="x"):
            iothread.thread_map(boom, range(8), 4)

    def test_threaded_reads_overlap_latency(self, monkeypatch, tmp_path):
        """With 5 ms per get and 16 chunk files, threaded read_region
        must beat serial by well over 2x (VERDICT r4 'done' bar)."""
        delay = 0.005
        path = str(tmp_path / "slow")
        rng = np.random.default_rng(0)
        data = rng.normal(size=(64,))
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "v", shape=(64,), chunks=(4,), dtype="<f8", dims=("x",)
        )
        zarrlite.write_full(meta, data)
        slow = _SlowStore(stores.FsStore(), delay)
        real_resolve = stores.resolve
        monkeypatch.setattr(
            stores, "resolve", lambda p: (slow, real_resolve(p)[1])
        )
        arrays, _ = zarrlite.open_group(path)
        t0 = time.perf_counter()
        monkeypatch.setenv("XBS_IO_THREADS", "1")
        np.testing.assert_array_equal(zarrlite.read_full(arrays["v"]), data)
        serial = time.perf_counter() - t0
        monkeypatch.setenv("XBS_IO_THREADS", "16")
        t0 = time.perf_counter()
        np.testing.assert_array_equal(zarrlite.read_full(arrays["v"]), data)
        threaded = time.perf_counter() - t0
        assert serial / threaded > 2.0, (serial, threaded)


class TestDistributedHttpRead:
    def test_from_zarr_over_http(self, spark, http_root):
        """Executors resolve http:// chunk paths themselves — the full
        distributed read path against an object-store-shaped backend
        (driver opens .zmetadata in one GET; each task GETs its chunks,
        threaded 16-wide because HttpStore is latency_bound)."""
        from xarray_beam_spark.dataset import Dataset
        from xarray_beam_spark.ndarray_ds import NDDataset
        from xarray_beam_spark.sources import zarr_io

        local, url = http_root
        rng = np.random.default_rng(11)
        nd = NDDataset(
            {"t2m": (("time", "x"), rng.normal(size=(16, 6)))},
            coords={"time": np.arange(16, dtype=np.int64), "x": np.arange(6, dtype=np.int64)},
        )
        zarr_io.to_zarr(
            Dataset.from_numpy(spark, nd, chunks={"time": 4}),
            f"{local}/dist",
            compressor={"id": "blosc", "cname": "lz4", "shuffle": 1},
        )
        REQUEST_LOG.clear()
        back = zarr_io.from_zarr(spark, f"{url}/dist", chunks={"time": 4})
        assert back.collect().equals(nd)
        # metadata is fetched ONCE (driver, consolidated .zmetadata) and
        # shipped to tasks — executors request only chunk files. Per-task
        # metadata GETs would multiply by the task count at scale (the
        # reference's stage_locally problem, zarr.py:374-386).
        meta_reqs = [p for p in REQUEST_LOG if ".zmetadata" in p]
        assert len(meta_reqs) == 1, REQUEST_LOG
        data_reqs = [p for p in REQUEST_LOG if "/t2m/" in p]
        assert len(data_reqs) == 4, REQUEST_LOG  # 16/4 time chunks, once each
