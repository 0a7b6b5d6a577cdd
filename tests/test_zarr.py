"""Zarr store + distributed read/write tests.

Mirrors the reference's zarr test strategy (``zarr_test.py:33-800``,
``integration_test.py:68-120``): metadata round-trips, region-write
alignment safety, missing-chunk fills, and the distributed
to_zarr → from_zarr identity on a multi-var, multi-dtype dataset.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.sources import zarr_io, zarrlite


def _fixture_ds(nt=20, nx=7) -> NDDataset:
    rng = np.random.default_rng(42)
    return NDDataset(
        data_vars={
            "temp": (("time", "x"), rng.normal(size=(nt, nx)).astype(np.float32)),
            "count": (("time", "x"), rng.integers(0, 100, size=(nt, nx)).astype(np.int64)),
            "static": (("x",), rng.normal(size=nx)),
        },
        coords={
            "time": np.arange("2020-01-01", nt, dtype="datetime64[D]").astype("datetime64[us]"),
            "x": np.arange(nx, dtype=np.int64),
        },
        attrs={"title": "fixture"},
    )


class TestZarrlite:
    def test_array_roundtrip_dtypes(self, tmp_path):
        path = str(tmp_path / "store")
        zarrlite.create_group(path, {"a": 1})
        for name, arr in {
            "f4": np.arange(24, dtype=np.float32).reshape(4, 6),
            "i8": np.arange(24, dtype=np.int64).reshape(4, 6),
            "b": (np.arange(24).reshape(4, 6) % 2 == 0),
            "dt": (np.datetime64("2021-01-01", "M") + np.arange(24))
            .astype("datetime64[us]")
            .reshape(4, 6),
        }.items():
            meta = zarrlite.create_array(
                path, name, arr.shape, (3, 4), arr.dtype, ("r", "c")
            )
            zarrlite.write_full(meta, arr)
            got = zarrlite.read_full(zarrlite.open_array(path, name))
            np.testing.assert_array_equal(got, arr)

    def test_unicode_roundtrip(self, tmp_path):
        path = str(tmp_path / "store")
        zarrlite.create_group(path)
        arr = np.array(["alpha", "beta", "gamma", "d"], dtype="<U5")
        meta = zarrlite.create_array(path, "s", arr.shape, (3,), arr.dtype, ("i",))
        zarrlite.write_full(meta, arr)
        np.testing.assert_array_equal(zarrlite.read_full(zarrlite.open_array(path, "s")), arr)

    def test_edge_chunk_padding_on_disk(self, tmp_path):
        """Edge chunks are stored padded to full chunk shape (v2 spec)."""
        path = str(tmp_path / "store")
        zarrlite.create_group(path)
        arr = np.arange(10, dtype=np.float64)
        meta = zarrlite.create_array(path, "v", arr.shape, (4,), arr.dtype, ("x",), compressor=None)
        zarrlite.write_full(meta, arr)
        # chunk 2 holds elements 8..9 padded to 4
        raw = open(os.path.join(path, "v", "2"), "rb").read()
        assert len(raw) == 4 * 8
        vals = np.frombuffer(raw, dtype=np.float64)
        np.testing.assert_array_equal(vals[:2], [8.0, 9.0])
        assert math.isnan(vals[2]) and math.isnan(vals[3])

    def test_missing_chunk_reads_fill(self, tmp_path):
        path = str(tmp_path / "store")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(path, "v", (8,), (4,), np.float64, ("x",))
        got = zarrlite.read_full(meta)
        assert got.shape == (8,) and np.isnan(got).all()

    def test_unaligned_region_write_rejected(self, tmp_path):
        path = str(tmp_path / "store")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(path, "v", (10,), (4,), np.float64, ("x",))
        with pytest.raises(ValueError, match="not aligned"):
            zarrlite.write_region(meta, {"x": 2}, np.zeros(4))
        with pytest.raises(ValueError, match="neither chunk-aligned"):
            zarrlite.write_region(meta, {"x": 4}, np.zeros(3))
        # aligned-to-edge is fine
        zarrlite.write_region(meta, {"x": 8}, np.zeros(2))

    def test_read_region_across_chunks(self, tmp_path):
        path = str(tmp_path / "store")
        zarrlite.create_group(path)
        arr = np.arange(48, dtype=np.int64).reshape(6, 8)
        meta = zarrlite.create_array(path, "v", arr.shape, (2, 3), arr.dtype, ("r", "c"))
        zarrlite.write_full(meta, arr)
        got = zarrlite.read_region(meta, {"r": 1, "c": 2}, {"r": 4, "c": 5})
        np.testing.assert_array_equal(got, arr[1:5, 2:7])


class TestDistributedZarr:
    def test_to_from_zarr_identity(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 6, "x": 4})
        stats = zarr_io.to_zarr(d, str(tmp_path / "out"), zarr_chunks={"time": 3, "x": 4})
        assert stats["chunks_written"] > 0
        back = zarr_io.from_zarr(spark, str(tmp_path / "out"))
        got = back.collect()
        assert got.identical(src) or got.equals(src)

    def test_from_zarr_respects_store_chunks(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 5})
        zarr_io.to_zarr(d, str(tmp_path / "out"), zarr_chunks={"time": 5, "x": 7})
        back = zarr_io.from_zarr(spark, str(tmp_path / "out"))
        assert back.chunks == {"time": 5, "x": 7}

    def test_from_zarr_custom_chunks_and_split_vars(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 5})
        zarr_io.to_zarr(d, str(tmp_path / "out"))
        back = zarr_io.from_zarr(
            spark, str(tmp_path / "out"), chunks={"time": 8, "x": 3}, split_vars=True
        )
        assert back.split_vars
        got = back.consolidate_variables().collect()
        assert got.equals(src)

    def test_misaligned_to_zarr_raises(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 6})
        with pytest.raises(ValueError, match="rechunk first"):
            zarr_io.to_zarr(d, str(tmp_path / "out"), zarr_chunks={"time": 4})

    def test_rechunk_then_write(self, spark, tmp_path):
        """Zarr → rechunk → Zarr round-trip (reference integration test)."""
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 4, "x": 7})
        zarr_io.to_zarr(d, str(tmp_path / "a"))
        a = zarr_io.from_zarr(spark, str(tmp_path / "a"))
        r = a.rechunk({"time": 10, "x": 2})
        zarr_io.to_zarr(r, str(tmp_path / "b"), zarr_chunks={"time": 5, "x": 2})
        back = zarr_io.from_zarr(spark, str(tmp_path / "b"))
        assert back.collect().equals(src)


class TestZarrV3:
    def test_v3_array_roundtrip(self, tmp_path):
        path = str(tmp_path / "s3")
        zarrlite.create_group(path, {"g": 1}, zarr_format=3)
        arr = np.arange(48, dtype=np.float64).reshape(6, 8)
        meta = zarrlite.create_array(
            path, "v", arr.shape, (2, 3), arr.dtype, ("r", "c"), zarr_format=3
        )
        zarrlite.write_full(meta, arr)
        got_meta = zarrlite.open_array(path, "v")
        assert got_meta.zarr_format == 3 and got_meta.shards is None
        np.testing.assert_array_equal(zarrlite.read_full(got_meta), arr)
        arrays, attrs = zarrlite.open_group(path)
        assert attrs == {"g": 1} and "v" in arrays

    def test_v3_sharded_roundtrip(self, tmp_path):
        import os

        path = str(tmp_path / "s3")
        zarrlite.create_group(path, zarr_format=3)
        arr = np.arange(240, dtype=np.int32).reshape(12, 20)
        meta = zarrlite.create_array(
            path, "v", arr.shape, (2, 5), arr.dtype, ("r", "c"),
            zarr_format=3, shards=(4, 10),
        )
        zarrlite.write_full(meta, arr)
        # shard files: 3 x 2 shard grid under c/
        assert sorted(os.listdir(os.path.join(path, "v", "c"))) == ["0", "1", "2"]
        got = zarrlite.open_array(path, "v")
        assert got.shards == (4, 10) and got.chunks == (2, 5)
        np.testing.assert_array_equal(zarrlite.read_full(got), arr)
        # single inner chunk read from inside a shard
        np.testing.assert_array_equal(
            zarrlite.read_chunk(got, (3, 1)), arr[6:8, 5:10]
        )

    def test_v3_sharded_edge_shards(self, tmp_path):
        path = str(tmp_path / "s3")
        zarrlite.create_group(path, zarr_format=3)
        arr = np.arange(70, dtype=np.float32).reshape(7, 10)
        meta = zarrlite.create_array(
            path, "v", arr.shape, (2, 4), arr.dtype, ("r", "c"),
            zarr_format=3, shards=(4, 8),
        )
        zarrlite.write_full(meta, arr)
        got = zarrlite.read_full(zarrlite.open_array(path, "v"))
        np.testing.assert_array_equal(got, arr)

    def test_v3_shard_alignment_enforced(self, tmp_path):
        path = str(tmp_path / "s3")
        zarrlite.create_group(path, zarr_format=3)
        meta = zarrlite.create_array(
            path, "v", (16,), (2,), np.float64, ("x",), zarr_format=3, shards=(8,)
        )
        with pytest.raises(ValueError, match="shard"):
            zarrlite.write_region(meta, {"x": 2}, np.zeros(2))
        zarrlite.write_region(meta, {"x": 8}, np.zeros(8))

    def test_v3_wrapped_dtypes(self, tmp_path):
        path = str(tmp_path / "s3")
        zarrlite.create_group(path, zarr_format=3)
        dt = (np.datetime64("2022-01-01", "h") + np.arange(10)).astype("datetime64[us]")
        meta = zarrlite.create_array(
            path, "time", dt.shape, (4,), dt.dtype, ("time",), zarr_format=3
        )
        zarrlite.write_full(meta, dt)
        got = zarrlite.open_array(path, "time")
        assert got.wrapped and got.logical_dtype == dt.dtype
        np.testing.assert_array_equal(zarrlite.read_full(got), dt)
        ss = np.array(["aa", "bbb", "c"], dtype="<U3")
        m2 = zarrlite.create_array(path, "s", ss.shape, (2,), ss.dtype, ("s",), zarr_format=3)
        zarrlite.write_full(m2, ss)
        np.testing.assert_array_equal(zarrlite.read_full(zarrlite.open_array(path, "s")), ss)

    def test_distributed_v3_sharded_roundtrip(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 10})
        stats = zarr_io.to_zarr(
            d,
            str(tmp_path / "out3"),
            zarr_chunks={"time": 5, "x": 7},
            zarr_format=3,
            zarr_chunks_per_shard={"time": 2},
        )
        assert stats["chunks_written"] > 0
        back = zarr_io.from_zarr(spark, str(tmp_path / "out3"))
        assert back.chunks == {"time": 5, "x": 7}
        got = back.collect()
        assert got.equals(src)


class TestScanRewrite:
    """The reference's `_whole_dataset_method` fast path: indexing ops on a
    pristine scan re-plan the read instead of filtering materialized
    chunks. Verified behaviorally AND via read counters."""

    def test_isel_rewrites_scan_and_reads_less(self, spark, tmp_path):
        from xarray_beam_spark.observability import get_counters

        src = _fixture_ds(nt=20, nx=7)
        Dataset.from_numpy(spark, src, chunks={"time": 5}).pipe(
            zarr_io.to_zarr, str(tmp_path / "s")
        )
        d = zarr_io.from_zarr(spark, str(tmp_path / "s"), chunks={"time": 5})
        assert d._scan is not None
        c = get_counters(spark)
        c.reset()
        got = d.isel(time=slice(3, 8)).collect()
        assert got.equals(src.isel({"time": slice(3, 8)}))
        # only the overlapping window was read: 5 elements of 20 → far
        # fewer chunk-reads than the full 4-chunk × 3-var grid
        snap = c.snapshot()
        assert snap["read.chunks"] <= 2 * len(src.data_vars)

    def test_getitem_pushes_projection(self, spark, tmp_path):
        from xarray_beam_spark.observability import get_counters

        src = _fixture_ds()
        Dataset.from_numpy(spark, src, chunks={"time": 10}).pipe(
            zarr_io.to_zarr, str(tmp_path / "s")
        )
        d = zarr_io.from_zarr(spark, str(tmp_path / "s"))
        c = get_counters(spark)
        c.reset()
        got = d["temp"].collect()
        assert got.equals(src[["temp"]])
        assert c.snapshot()["read.chunks"] <= 4  # temp only, not count/static

    def test_rechunk_on_scan_is_reread(self, spark, tmp_path):
        src = _fixture_ds()
        Dataset.from_numpy(spark, src, chunks={"time": 4}).pipe(
            zarr_io.to_zarr, str(tmp_path / "s")
        )
        d = zarr_io.from_zarr(spark, str(tmp_path / "s"))
        r = d.rechunk({"time": 10, "x": 3})
        assert r._scan is not None  # still a scan, not a shuffle chain
        assert r.chunks == {"time": 10, "x": 3}
        assert r.collect().equals(src)

    def test_shuffle_rechunk_still_used_after_transform(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 4})
        m = d.map_blocks(lambda ds: ds.map(lambda a: a * 1))
        assert m._scan is None
        r = m.rechunk({"time": 10})
        assert r.collect().equals(src.map(lambda a: a * 1))

    def test_memory_scan_rewrite(self, spark):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 6})
        got = d.head(time=7).collect()
        assert got.equals(src.isel({"time": slice(0, 7)}))
        got2 = d["count"].tail(time=5).collect()
        assert got2.equals(src[["count"]].isel({"time": slice(-5, None)}))


class TestIncrementalWrites:
    def test_append_pattern_with_origin(self, spark, tmp_path):
        """Setup the store once for the full extent, then two jobs
        region-write their halves (reference replace_template_dims +
        needs_setup pattern)."""
        src = _fixture_ds(nt=20)
        full_tmpl = None
        d_all = Dataset.from_numpy(spark, src, chunks={"time": 5})
        full_tmpl = d_all.template
        path = str(tmp_path / "inc")
        zarr_io.setup_zarr(full_tmpl, path, {"time": 5, "x": 7})
        first = Dataset.from_numpy(spark, src.isel({"time": slice(0, 10)}), chunks={"time": 5})
        second = Dataset.from_numpy(spark, src.isel({"time": slice(10, 20)}), chunks={"time": 5})
        zarr_io.to_zarr(first, path, needs_setup=False)
        zarr_io.to_zarr(second, path, needs_setup=False, origin={"time": 10})
        got = zarr_io.from_zarr(spark, path).collect()
        assert got.equals(src)

    def test_unaligned_origin_rejected(self, spark, tmp_path):
        src = _fixture_ds(nt=20)
        d = Dataset.from_numpy(spark, src, chunks={"time": 5})
        path = str(tmp_path / "inc")
        zarr_io.setup_zarr(d.template, path, {"time": 5, "x": 7})
        part = Dataset.from_numpy(spark, src.isel({"time": slice(0, 5)}), chunks={"time": 5})
        with pytest.raises(ValueError, match="origin"):
            zarr_io.to_zarr(part, path, needs_setup=False, origin={"time": 3})

    def test_replace_template_dims(self, spark):
        src = _fixture_ds(nt=4)
        tmpl = Dataset.from_numpy(spark, src, chunks={}).template
        big_time = (np.datetime64("2020-01-01", "D") + np.arange(100)).astype("datetime64[us]")
        big = zarr_io.replace_template_dims(tmpl, coords={"time": big_time})
        assert big.sizes["time"] == 100
        assert len(big.coords["time"].values) == 100
        assert big.var_meta == tmpl.var_meta

    def test_replace_template_dims_multidim_coord(self, spark):
        """ADVICE r1: a multi-dim coord must be dropped when ANY of its
        dims' sizes change, not silently kept stale."""
        import numpy as np

        from xarray_beam_spark.dataset import Template
        from xarray_beam_spark.ndarray_ds import Variable

        tmpl = Template(
            sizes={"y": 3, "x": 4},
            var_meta={"v": (("y", "x"), "<f8")},
            coords={
                "x": Variable(("x",), np.arange(4)),
                "cell_area": Variable(("y", "x"), np.ones((3, 4))),
            },
        )
        grown = zarr_io.replace_template_dims(tmpl, sizes={"y": 10})
        assert grown.sizes["y"] == 10
        assert "cell_area" not in grown.coords  # stale on the y axis
        assert "x" in grown.coords  # x unchanged, kept
        same = zarr_io.replace_template_dims(tmpl, sizes={"y": 3})
        assert "cell_area" in same.coords


def test_byte_string_chunks(spark):
    src = _fixture_ds(nt=20, nx=7)
    # itemsize = 4+8+8 = 20 B/element (split_vars=False); '1KB' along time
    # with x=7 resolved → 1000 // (20*7) = 7 elements
    d = Dataset.from_numpy(spark, src, chunks={"time": "1KB"})
    assert d.chunks["time"] == 7
    assert d.collect().identical(src)


class TestZarrProperties:
    """Hypothesis: random shapes/chunks/shards round-trip bit-exactly
    (the reference property-tests its plan math the same way,
    ``rechunker_algorithm_test.py``)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _store(tmpdir, zarr_format):
        import os
        import uuid

        path = os.path.join(str(tmpdir), uuid.uuid4().hex[:8])
        zarrlite.create_group(path, zarr_format=zarr_format)
        return path

    @given(
        shape=st.tuples(st.integers(1, 12), st.integers(1, 9)),
        chunks=st.tuples(st.integers(1, 6), st.integers(1, 5)),
        fmt=st.sampled_from([2, 3]),
        compress=st.booleans(),
    )
    @settings(max_examples=25, deadline=None)
    def test_roundtrip_random_grid(self, tmp_path_factory, shape, chunks, fmt, compress):
        tmp = tmp_path_factory.mktemp("zp")
        path = self._store(tmp, fmt)
        rng = np.random.default_rng(abs(hash((shape, chunks, fmt))) % 2**32)
        arr = rng.normal(size=shape)
        meta = zarrlite.create_array(
            path, "v", shape, chunks, arr.dtype, ("a", "b"),
            zarr_format=fmt, compressor="zlib" if compress else None,
        )
        zarrlite.write_full(meta, arr)
        np.testing.assert_array_equal(zarrlite.read_full(zarrlite.open_array(path, "v")), arr)

    @given(
        size=st.integers(4, 40),
        chunk=st.integers(1, 6),
        mult=st.integers(1, 4),
        r_start=st.integers(0, 10),
        r_len=st.integers(1, 20),
    )
    @settings(max_examples=25, deadline=None)
    def test_sharded_region_reads(self, tmp_path_factory, size, chunk, mult, r_start, r_len):
        tmp = tmp_path_factory.mktemp("zp")
        path = self._store(tmp, 3)
        shard = chunk * mult
        arr = np.arange(size, dtype=np.int64)
        meta = zarrlite.create_array(
            path, "v", (size,), (chunk,), arr.dtype, ("x",), zarr_format=3, shards=(shard,)
        )
        zarrlite.write_full(meta, arr)
        start = min(r_start, size - 1)
        stop = min(start + r_len, size)
        got = zarrlite.read_region(
            zarrlite.open_array(path, "v"), {"x": start}, {"x": stop - start}
        )
        np.testing.assert_array_equal(got, arr[start:stop])


class TestStoreSeam:
    """VERDICT r1 #4: zarrlite IO goes through the Store interface; the
    in-memory dict backend proves the seam (an object-store backend is the
    same four methods)."""

    def test_memstore_roundtrip_v2_and_v3(self):
        import numpy as np

        from xarray_beam_spark.sources import stores, zarrlite as zl

        for fmt, name in ((2, "m2"), (3, "m3")):
            path = f"mem://seam_{fmt}/grp"
            zl.create_group(path, {"title": "mem"}, zarr_format=fmt)
            meta = zl.create_array(
                path, "v", shape=(5, 6), chunks=(2, 3), dtype="<f8",
                dims=("y", "x"), zarr_format=fmt,
            )
            arr = np.arange(30, dtype=np.float64).reshape(5, 6)
            zl.write_full(meta, arr)
            arrays, attrs = zl.open_group(path)
            assert attrs["title"] == "mem"
            got = zl.read_full(arrays["v"])
            np.testing.assert_array_equal(got, arr)
            # region read assembles across chunk boundaries
            np.testing.assert_array_equal(
                zl.read_region(arrays["v"], {"y": 1, "x": 2}, {"y": 3, "x": 3}),
                arr[1:4, 2:5],
            )
            # blobs really live in the dict store, not on disk
            ms = stores.memory_store(f"seam_{fmt}")
            assert any(k.endswith((".zarray", "zarr.json")) for k in ms.blobs)

    def test_memstore_sharded_v3(self):
        import numpy as np

        from xarray_beam_spark.sources import zarrlite as zl

        path = "mem://seam_shard/grp"
        zl.create_group(path, {}, zarr_format=3)
        meta = zl.create_array(
            path, "v", shape=(8,), chunks=(2,), dtype="<i8", dims=("t",),
            zarr_format=3, shards=(4,),
        )
        arr = np.arange(8, dtype=np.int64)
        zl.write_full(meta, arr)
        arrays, _ = zl.open_group(path)
        np.testing.assert_array_equal(zl.read_full(arrays["v"]), arr)
        np.testing.assert_array_equal(
            zl.read_region(arrays["v"], {"t": 3}, {"t": 4}), arr[3:7]
        )

    def test_missing_group_raises(self):
        import pytest as _pytest

        from xarray_beam_spark.sources import zarrlite as zl

        with _pytest.raises(FileNotFoundError):
            zl.open_group("mem://seam_missing/nope")


class TestCoRead:
    """VERDICT r1 #5: N-way co-read — one scan reads N same-grid stores,
    zero join exchange in the plan (reference DatasetToChunks([ds1,ds2]),
    core.py:419-460)."""

    def test_zip_from_zarr_matches_zip_map(self, spark, tmp_path):
        import numpy as np

        from xarray_beam_spark.dataset import Dataset
        from xarray_beam_spark.ndarray_ds import NDDataset, Variable
        from xarray_beam_spark.sources import zarr_io

        rng = np.random.default_rng(3)
        a = rng.normal(size=(12, 5)) + 10.0
        b = rng.normal(size=(12, 5)) + 5.0
        coords = {"t": np.arange(12, dtype=np.int64)}
        dsa = NDDataset({"x": (("t", "y"), a)}, coords, {})
        dsb = NDDataset({"z": (("t", "y"), b)}, coords, {})
        pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
        zarr_io.to_zarr(Dataset.from_numpy(spark, dsa, chunks={"t": 4}), pa)
        zarr_io.to_zarr(Dataset.from_numpy(spark, dsb, chunks={"t": 4}), pb)

        def ratio(da: NDDataset, db: NDDataset) -> NDDataset:
            return NDDataset(
                {"r": Variable(("t", "y"), da.data_vars["x"].values / db.data_vars["z"].values)},
                da.coords,
            )

        co = zarr_io.zip_from_zarr(spark, [pa, pb], ratio, chunks={"t": 4})
        plan = co.df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "Exchange" not in plan  # zero-join co-read
        got = co.collect()
        np.testing.assert_allclose(got.data_vars["r"].values, a / b, rtol=0)
        np.testing.assert_array_equal(got.coords["t"].values, coords["t"])

    def test_zip_from_zarr_grid_mismatch_raises(self, spark, tmp_path):
        import numpy as np
        import pytest as _pytest

        from xarray_beam_spark.dataset import Dataset
        from xarray_beam_spark.ndarray_ds import NDDataset
        from xarray_beam_spark.sources import zarr_io

        dsa = NDDataset({"x": (("t",), np.arange(6.0))}, {}, {})
        dsb = NDDataset({"x": (("t",), np.arange(8.0))}, {}, {})
        pa, pb = str(tmp_path / "ga"), str(tmp_path / "gb")
        zarr_io.to_zarr(Dataset.from_numpy(spark, dsa, chunks={"t": 3}), pa)
        zarr_io.to_zarr(Dataset.from_numpy(spark, dsb, chunks={"t": 4}), pb)
        with _pytest.raises(ValueError, match="identical grids"):
            zarr_io.zip_from_zarr(spark, [pa, pb], lambda a, b: a)


class TestConsolidatedMetadata:
    def test_setup_writes_zmetadata_and_open_uses_it_alone(self, spark, tmp_path):
        import json

        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 6, "x": 4})
        out = str(tmp_path / "out")
        zarr_io.to_zarr(d, out, zarr_chunks={"time": 3, "x": 4})
        doc = json.load(open(os.path.join(out, ".zmetadata")))
        assert doc["zarr_consolidated_format"] == 1
        assert any(k.endswith("/.zarray") for k in doc["metadata"])

        # delete every loose metadata object: open must succeed from the
        # consolidated doc alone (proves the single-GET path is real)
        for root, _dirs, files in os.walk(out):
            for f in files:
                if f in (".zarray", ".zattrs", ".zgroup"):
                    os.remove(os.path.join(root, f))
        arrays, attrs = zarrlite.open_group(out)
        assert set(arrays) >= set(src.data_vars)
        back = zarr_io.from_zarr(spark, out).collect()
        assert back.identical(src) or back.equals(src)

    def test_v3_store_opens_without_zmetadata(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 6, "x": 4})
        out = str(tmp_path / "v3")
        zarr_io.to_zarr(d, out, zarr_chunks={"time": 3, "x": 4}, zarr_format=3)
        assert not os.path.exists(os.path.join(out, ".zmetadata"))
        back = zarr_io.from_zarr(spark, out).collect()
        assert back.identical(src) or back.equals(src)


class TestPerVarEncoding:
    """Reference ``ChunksToZarr(encoding=...)`` surface: per-variable
    compressor / fill_value overrides on setup_zarr / to_zarr."""

    def test_mixed_compressors_roundtrip(self, spark, tmp_path):
        nd = _fixture_ds()
        path = str(tmp_path / "enc")
        d = Dataset.from_numpy(spark, nd, chunks={"time": 10})
        zarr_io.to_zarr(
            d,
            path,
            zarr_chunks={"time": 10},
            compressor="zlib",
            encoding={
                "temp": {"compressor": {"id": "blosc", "cname": "lz4", "shuffle": 1}},
                "count": {"compressor": None},
            },
        )
        import json, os

        meta_t = json.load(open(os.path.join(path, "temp", ".zarray")))
        meta_c = json.load(open(os.path.join(path, "count", ".zarray")))
        meta_s = json.load(open(os.path.join(path, "static", ".zarray")))
        assert meta_t["compressor"]["id"] == "blosc"
        assert meta_c["compressor"] is None
        assert meta_s["compressor"]["id"] == "zlib"  # store-wide default
        back = zarr_io.from_zarr(spark, path).collect()
        assert back.equals(nd)

    def test_fill_value_override(self, tmp_path):
        path = str(tmp_path / "fill")
        from xarray_beam_spark.dataset import Template
        from xarray_beam_spark.ndarray_ds import Variable

        tmpl = Template(
            sizes={"x": 6},
            var_meta={"v": (("x",), "<f8")},
            coords={"x": Variable(("x",), np.arange(6))},
            attrs={},
        )
        zarr_io.setup_zarr(
            tmpl, path, {"x": 3}, encoding={"v": {"fill_value": -9999.0}}
        )
        meta = zarrlite.open_array(path, "v")
        assert meta.fill_value == -9999.0
        # missing chunks read back as the override, not NaN
        np.testing.assert_array_equal(
            zarrlite.read_full(meta), np.full(6, -9999.0)
        )

    def test_unknown_encoding_rejected(self, tmp_path):
        from xarray_beam_spark.dataset import Template
        from xarray_beam_spark.ndarray_ds import Variable

        tmpl = Template(
            sizes={"x": 4},
            var_meta={"v": (("x",), "<f8")},
            coords={"x": Variable(("x",), np.arange(4))},
            attrs={},
        )
        with pytest.raises(ValueError, match="unknown variables"):
            zarr_io.setup_zarr(
                tmpl, str(tmp_path / "a"), {"x": 2}, encoding={"nope": {}}
            )
        with pytest.raises(ValueError, match="unsupported encoding keys"):
            zarr_io.setup_zarr(
                tmpl, str(tmp_path / "b"), {"x": 2},
                encoding={"v": {"least_significant_digit": 2}},
            )


class TestCFPacking:
    """CF scale_factor/add_offset/_FillValue conventions — the reference
    reads stores through xarray, which mask_and_scales by default; write
    packing is the reference's ``ChunksToZarr(encoding=...)`` dtype
    surface (ERA5-style int16 packing)."""

    def test_packed_roundtrip_with_nans(self, spark, tmp_path):
        rng = np.random.default_rng(9)
        vals = np.round(rng.uniform(250.0, 320.0, size=(12, 5)), 2)
        vals[3, 2] = np.nan
        nd = NDDataset(
            {"t2m": (("time", "x"), vals)},
            coords={"time": np.arange(12, dtype=np.int64)},
        )
        path = str(tmp_path / "packed")
        zarr_io.to_zarr(
            Dataset.from_numpy(spark, nd, chunks={"time": 6}),
            path,
            encoding={
                "t2m": {"dtype": "<i2", "scale_factor": 0.01, "add_offset": 273.15}
            },
        )
        # the stored array really is int16 with CF attrs
        raw = zarrlite.open_array(path, "t2m")
        assert raw.dtype == np.dtype("<i2")
        assert raw.attrs["scale_factor"] == 0.01
        # read back: decoded float64, NaN restored
        back = zarr_io.from_zarr(spark, path).collect()
        got = back.data_vars["t2m"].values
        assert np.isnan(got[3, 2])
        mask = ~np.isnan(vals)
        np.testing.assert_allclose(got[mask], vals[mask], atol=0.0051)

    def test_foreign_cf_store_decodes(self, spark, tmp_path):
        """A store with CF attrs written by ANY tool decodes on read —
        incl. never-written chunks (fill → NaN) and the SQL surface."""
        path = str(tmp_path / "foreign")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "v", shape=(6,), chunks=(3,), dtype="<i2", dims=("x",),
            fill_value=-32768,
            attrs={"scale_factor": 0.5, "add_offset": 100.0, "_FillValue": -32768},
        )
        coord = zarrlite.create_array(
            path, "x", shape=(6,), chunks=(6,), dtype="<i8", dims=("x",),
            compressor=None,
        )
        zarrlite.write_full(coord, np.arange(6, dtype=np.int64))
        # write only the FIRST chunk of v
        zarrlite.write_region(meta, {"x": 0}, np.array([2, 4, -32768], "<i2"))
        ds = zarr_io.from_zarr(spark, path)
        assert ds.template.var_meta["v"][1] == "<f8"
        got = ds.collect().data_vars["v"].values
        np.testing.assert_array_equal(got[:2], [101.0, 102.0])
        assert np.isnan(got[2:]).all()  # explicit fill + missing chunk
        # SQL surface sees decoded doubles too
        from xarray_beam_spark.sources import spark_datasource

        spark_datasource.register(spark)
        rows = (
            spark.read.format("xbs_zarr").option("path", path).load()
            .orderBy("x").collect()
        )
        assert rows[0]["v"] == 101.0 and rows[1]["v"] == 102.0

    def test_cf_overflow_rejected(self, spark, tmp_path):
        nd = NDDataset({"v": (("x",), np.array([1e9]))})
        with pytest.raises(Exception, match="overflow"):
            zarr_io.to_zarr(
                Dataset.from_numpy(spark, nd, chunks={"x": 1}),
                str(tmp_path / "o"),
                encoding={"v": {"dtype": "<i2", "scale_factor": 1.0}},
            )

    def test_sql_write_packs(self, spark, tmp_path):
        """df.write.format('xbs_zarr') into a CF-packed store encodes
        through the same helper (buffers in the decoded domain)."""
        from xarray_beam_spark.dataset import Template
        from xarray_beam_spark.ndarray_ds import Variable
        from xarray_beam_spark.sources import spark_datasource

        tmpl = Template(
            sizes={"x": 4},
            var_meta={"v": (("x",), "<f8")},
            coords={"x": Variable(("x",), np.arange(4, dtype=np.int64))},
            attrs={},
        )
        dst = str(tmp_path / "sqlpack")
        zarr_io.setup_zarr(
            tmpl, dst, {"x": 4},
            encoding={"v": {"dtype": "<i2", "scale_factor": 0.25}},
        )
        spark_datasource.register(spark)
        df = spark.createDataFrame([(0, 1.25), (2, 2.5)], "x long, v double")
        df.coalesce(1).write.format("xbs_zarr").option("path", dst).mode("append").save()
        raw = zarrlite.read_full(zarrlite.open_array(dst, "v"))
        np.testing.assert_array_equal(raw, np.array([5, -32768, 10, -32768], "<i2"))
        decoded = zarr_io.read_region_decoded(
            zarrlite.open_array(dst, "v"), {}, {}
        )
        np.testing.assert_array_equal(decoded[[0, 2]], [1.25, 2.5])
        assert np.isnan(decoded[[1, 3]]).all()


class TestCFEdgeCases:
    """Review findings: float-stored CF arrays must not be quantized,
    fill-code collisions must fail loudly, packed coordinates decode."""

    def test_float_store_with_fill_mask_not_rounded(self, tmp_path):
        path = str(tmp_path / "fmask")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "v", shape=(4,), chunks=(4,), dtype="<f8", dims=("x",),
            attrs={"_FillValue": -9999.0},
        )
        vals = np.array([1.25, 2.5, np.nan, 0.5])
        zarrlite.write_region(meta, {"x": 0}, zarr_io.cf_encode(meta, vals))
        got = zarr_io.read_region_decoded(meta, {}, {})
        np.testing.assert_array_equal(got[[0, 1, 3]], [1.25, 2.5, 0.5])  # NOT rounded
        assert np.isnan(got[2])
        # f4 store keeps f4 decode width
        meta4 = zarrlite.create_array(
            path, "w", shape=(2,), chunks=(2,), dtype="<f4", dims=("x",),
            attrs={"_FillValue": -9.0},
        )
        assert zarr_io.cf_decoded_dtype(meta4) == "<f4"

    def test_value_on_fill_code_rejected(self, tmp_path):
        path = str(tmp_path / "coll")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "v", shape=(2,), chunks=(2,), dtype="<i2", dims=("x",),
            attrs={"scale_factor": 1.0, "add_offset": 0.0, "_FillValue": -32768},
        )
        with pytest.raises(ValueError, match="packs exactly to the _FillValue"):
            zarr_io.cf_encode(meta, np.array([-32768.0, 1.0]))

    def test_unsigned_packing_default_fill_avoids_zero(self, tmp_path):
        from xarray_beam_spark.dataset import Template
        from xarray_beam_spark.ndarray_ds import Variable

        tmpl = Template(
            sizes={"x": 3},
            var_meta={"v": (("x",), "<f8")},
            coords={"x": Variable(("x",), np.arange(3, dtype=np.int64))},
            attrs={},
        )
        path = str(tmp_path / "u1")
        zarr_io.setup_zarr(
            tmpl, path, {"x": 3}, encoding={"v": {"dtype": "<u1", "scale_factor": 1.0}}
        )
        meta = zarrlite.open_array(path, "v")
        assert meta.attrs["_FillValue"] == 255  # NOT 0
        # value 0.0 survives the roundtrip
        zarrlite.write_region(meta, {"x": 0}, zarr_io.cf_encode(meta, np.array([0.0, 1.0, np.nan])))
        got = zarr_io.read_region_decoded(meta, {}, {})
        np.testing.assert_array_equal(got[:2], [0.0, 1.0])
        assert np.isnan(got[2])

    def test_packed_coordinate_decodes(self, spark, tmp_path):
        path = str(tmp_path / "pc")
        zarrlite.create_group(path)
        lat = zarrlite.create_array(
            path, "lat", shape=(4,), chunks=(4,), dtype="<i2", dims=("lat",),
            attrs={"scale_factor": 0.5, "add_offset": -90.0},
        )
        zarrlite.write_full(lat, np.array([0, 1, 2, 3], "<i2"))
        v = zarrlite.create_array(
            path, "v", shape=(4,), chunks=(4,), dtype="<f8", dims=("lat",)
        )
        zarrlite.write_full(v, np.arange(4.0))
        tmpl, _, _ = zarr_io.open_zarr_meta(path)
        np.testing.assert_array_equal(
            tmpl.coords["lat"].values, [-90.0, -89.5, -89.0, -88.5]
        )



def _leftover_temps(store_path: str) -> list:
    """Recursive .tmp scan: chunk temps land INSIDE the array directory
    (<store>/v/<chunk>.tmp.<pid>.<id>, stores.py atomic-write naming) —
    a root-level listdir can never see them, which made the original
    no-leaked-temp assertions vacuous."""
    out = []
    for root, _dirs, files in os.walk(store_path):
        out += [os.path.join(root, f) for f in files if ".tmp" in f]
    return out


class TestRetryIdempotency:
    """Task retries and speculative duplicates re-execute a region write
    with the SAME payload. The aligned-write + atomic-rename contract
    (reference zarr.py:516-587's safety rule) must make that a no-op:
    identical final bytes, no torn chunks, no leaked temp files."""

    def _store(self, tmp_path):
        path = str(tmp_path / "retry.zarr")
        rng = np.random.default_rng(11)
        data = rng.normal(size=(12, 8))
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "v", shape=(12, 8), chunks=(4, 8), dtype="<f8", dims=("t", "x")
        )
        return path, meta, data

    def test_same_region_written_twice(self, tmp_path):
        path, meta, data = self._store(tmp_path)
        region = data[4:8]
        zarrlite.write_region(meta, {"t": 4}, region)
        zarrlite.write_region(meta, {"t": 4}, region)  # the retried attempt
        got = zarrlite.read_full(meta)
        np.testing.assert_array_equal(got[4:8], region)
        leftovers = _leftover_temps(path)
        assert leftovers == [], leftovers

    def test_concurrent_duplicate_attempts(self, tmp_path):
        """Two 'attempts' racing on the same chunks (speculation): both
        write identical payloads; whichever rename lands last, the chunk
        is one complete blob — never interleaved."""
        import threading

        path, meta, data = self._store(tmp_path)
        errs = []

        def attempt():
            try:
                for _ in range(10):
                    zarrlite.write_region(meta, {"t": 0}, data[0:4])
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [threading.Thread(target=attempt) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errs == []
        got = zarrlite.read_full(meta)
        np.testing.assert_array_equal(got[0:4], data[0:4])
        leftovers = _leftover_temps(path)
        assert leftovers == [], leftovers


class TestV2Filters:
    """numcodecs Delta / FixedScaleOffset filters (VERDICT r8 task #5):
    real-world xarray-written v2 stores carry them; unknown filters must
    still fail loudly at open time."""

    def test_delta_int64_exact_roundtrip(self, tmp_path):
        d = str(tmp_path / "g")
        zarrlite.create_group(d, {}, zarr_format=2)
        m = zarrlite.create_array(
            d, "v", shape=(10, 6), chunks=(4, 6), dtype="<i8", dims=("x", "y"),
            compressor="zlib", filters=[{"id": "delta", "dtype": "<i8"}],
        )
        vals = np.arange(60, dtype=np.int64).reshape(10, 6) * 7 - 100
        zarrlite.write_full(m, vals)
        m2 = zarrlite.open_array(d, "v")
        assert m2.filters == ({"id": "delta", "dtype": "<i8", "astype": "<i8"},)
        np.testing.assert_array_equal(zarrlite.read_full(m2), vals)
        # partial window crossing a chunk boundary decodes correctly
        np.testing.assert_array_equal(
            zarrlite.read_region(m2, {"x": 2}, {"x": 5}), vals[2:7]
        )

    def test_delta_bytes_actually_differ(self, tmp_path):
        """The stored chunk really is delta-coded (not a no-op): with no
        compressor the first chunk's raw bytes are the diffs."""
        d = str(tmp_path / "g")
        zarrlite.create_group(d, {}, zarr_format=2)
        m = zarrlite.create_array(
            d, "v", shape=(4,), chunks=(4,), dtype="<i8", dims=("x",),
            compressor=None, filters=[{"id": "delta", "dtype": "<i8"}],
        )
        zarrlite.write_full(m, np.array([10, 13, 13, 20], dtype=np.int64))
        raw = np.frombuffer((tmp_path / "g" / "v" / "0").read_bytes(), "<i8")
        np.testing.assert_array_equal(raw, [10, 3, 0, 7])

    def test_fixedscaleoffset_quantized_roundtrip(self, tmp_path):
        d = str(tmp_path / "g")
        zarrlite.create_group(d, {}, zarr_format=2)
        m = zarrlite.create_array(
            d, "w", shape=(10,), chunks=(4,), dtype="<f8", dims=("x",),
            compressor="zlib",
            filters=[{
                "id": "fixedscaleoffset", "dtype": "<f8", "astype": "<i2",
                "scale": 100, "offset": 5.0,
            }],
        )
        w = 5.0 + np.round(np.linspace(-1, 1, 10), 2)
        zarrlite.write_full(m, w)
        got = zarrlite.read_full(zarrlite.open_array(d, "w"))
        np.testing.assert_allclose(got, w, atol=0.5 / 100)

    def test_chained_filters_roundtrip(self, tmp_path):
        d = str(tmp_path / "g")
        zarrlite.create_group(d, {}, zarr_format=2)
        m = zarrlite.create_array(
            d, "z", shape=(10,), chunks=(5,), dtype="<f8", dims=("x",),
            compressor="zlib",
            filters=[
                {"id": "fixedscaleoffset", "dtype": "<f8", "astype": "<i4",
                 "scale": 1000, "offset": 0.0},
                {"id": "delta", "dtype": "<i4"},
            ],
        )
        z = np.arange(10) / 8.0
        zarrlite.write_full(m, z)
        got = zarrlite.read_full(zarrlite.open_array(d, "z"))
        np.testing.assert_allclose(got, z, atol=0.5 / 1000)

    def test_unknown_filter_fails_loudly(self, tmp_path):
        """A foreign store with a filter we cannot decode must be
        rejected at open time, never decoded as garbage."""
        import json

        d = str(tmp_path / "g")
        zarrlite.create_group(d, {}, zarr_format=2)
        m = zarrlite.create_array(
            d, "v", shape=(4,), chunks=(4,), dtype="<i8", dims=("x",),
        )
        doc = json.loads((tmp_path / "g" / "v" / ".zarray").read_text())
        doc["filters"] = [{"id": "quantize", "digits": 3, "dtype": "<f8"}]
        (tmp_path / "g" / "v" / ".zarray").write_text(json.dumps(doc))
        with pytest.raises(ValueError, match="unsupported filter"):
            zarrlite.open_array(d, "v")
        with pytest.raises(ValueError, match="unsupported filter"):
            zarrlite.create_array(
                d, "b", shape=(4,), chunks=(4,), dtype="<i8", dims=("x",),
                filters=[{"id": "bitround", "keepbits": 3, "dtype": "<i8"}],
            )

    def test_filter_chain_validation(self, tmp_path):
        d = str(tmp_path / "g")
        zarrlite.create_group(d, {}, zarr_format=2)
        with pytest.raises(ValueError, match="does not chain"):
            zarrlite.create_array(
                d, "v", shape=(4,), chunks=(4,), dtype="<i8", dims=("x",),
                filters=[{"id": "delta", "dtype": "<i4"}],  # array is <i8
            )
        with pytest.raises(ValueError, match="v2 feature"):
            zarrlite.create_array(
                d, "v3f", shape=(4,), chunks=(4,), dtype="<i8", dims=("x",),
                zarr_format=3, filters=[{"id": "delta", "dtype": "<i8"}],
            )

    def test_to_zarr_encoding_filters_distributed(self, spark, tmp_path):
        """End-to-end: to_zarr(encoding={'count': {'filters': [Delta]}})
        writes a filtered store that reads back identically (Delta over
        int64 is exact), and the .zarray advertises the filter so any
        zarr-python reader applies it."""
        import json

        nd = _fixture_ds()
        d = Dataset.from_numpy(spark, nd, chunks={"time": 5})
        out = str(tmp_path / "filtered.zarr")
        zarr_io.to_zarr(
            d, out,
            encoding={"count": {"filters": [{"id": "delta", "dtype": "<i8"}]}},
        )
        doc = json.loads((tmp_path / "filtered.zarr" / "count" / ".zarray").read_text())
        assert doc["filters"] == [{"astype": "<i8", "dtype": "<i8", "id": "delta"}]
        back = zarr_io.from_zarr(spark, out).collect()
        assert back.identical(nd)


class TestForeignFilterStore:
    """VERDICT r9 #6: the r9 filter gates round-trip OUR writer. These
    fixtures are written byte-for-byte the way zarr-python v2 +
    numcodecs spell a filtered store (.zarray field set, get_config()
    filter dicts, 'NaN' fill string, zlib chunk payloads), so any
    metadata-spelling drift in our reader fails here even though our
    writer would never produce it."""

    @staticmethod
    def _write_json(p, doc):
        import json

        p.write_text(json.dumps(doc))

    def _foreign_store(self, tmp_path):
        import zlib

        root = tmp_path / "foreign_numcodecs"
        root.mkdir()
        self._write_json(root / ".zgroup", {"zarr_format": 2})

        # coordinate array: plain int64, no compressor
        (root / "x").mkdir()
        self._write_json(root / "x" / ".zarray", {
            "chunks": [10], "compressor": None, "dtype": "<i8",
            "fill_value": 0, "filters": None, "order": "C",
            "shape": [10], "zarr_format": 2, "dimension_separator": ".",
        })
        self._write_json(root / "x" / ".zattrs", {"_ARRAY_DIMENSIONS": ["x"]})
        (root / "x" / "0").write_bytes(np.arange(10, dtype="<i8").tobytes())

        # data array: float64, chained FixedScaleOffset -> Delta exactly
        # as numcodecs get_config() serializes them, zlib level 1
        vals = np.arange(10, dtype="<f8") * 7 / 1000.0  # lossless at scale
        (root / "v").mkdir()
        self._write_json(root / "v" / ".zarray", {
            "chunks": [5],
            "compressor": {"id": "zlib", "level": 1},
            "dtype": "<f8",
            "fill_value": "NaN",
            "filters": [
                {"id": "fixedscaleoffset", "scale": 1000, "offset": 0.0,
                 "dtype": "<f8", "astype": "<i4"},
                {"id": "delta", "dtype": "<i4", "astype": "<i4"},
            ],
            "order": "C",
            "shape": [10],
            "zarr_format": 2,
            "dimension_separator": ".",
        })
        self._write_json(root / "v" / ".zattrs", {"_ARRAY_DIMENSIONS": ["x"]})
        for ci in range(2):
            chunk = vals[ci * 5:(ci + 1) * 5]
            # numcodecs FixedScaleOffset.encode
            enc = np.around((chunk - 0.0) * 1000).astype("<i4")
            # numcodecs Delta.encode
            dl = np.empty_like(enc)
            dl[0], dl[1:] = enc[0], np.diff(enc)
            (root / "v" / str(ci)).write_bytes(zlib.compress(dl.tobytes(), 1))

        # second data array: Delta alone with a NARROWING astype
        # (dtype <i8 stored as <i4), numcodecs-legal and spelled as such
        big = (np.arange(10, dtype="<i8") * 1_000_003) - 5
        (root / "w").mkdir()
        self._write_json(root / "w" / ".zarray", {
            "chunks": [10], "compressor": None, "dtype": "<i8",
            "fill_value": 0,
            "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}],
            "order": "C", "shape": [10], "zarr_format": 2,
        })
        self._write_json(root / "w" / ".zattrs", {"_ARRAY_DIMENSIONS": ["x"]})
        dl = np.empty(10, dtype="<i4")
        dl[0], dl[1:] = big[0], np.diff(big).astype("<i4")
        (root / "w" / "0").write_bytes(dl.tobytes())
        return str(root), vals, big

    def test_foreign_filtered_store_reads_exactly(self, tmp_path):
        path, vals, big = self._foreign_store(tmp_path)
        m = zarrlite.open_array(path, "v")
        # the parsed chain preserves the numcodecs spelling
        assert m.filters == (
            {"id": "fixedscaleoffset", "dtype": "<f8", "astype": "<i4",
             "scale": 1000, "offset": 0.0},
            {"id": "delta", "dtype": "<i4", "astype": "<i4"},
        )
        assert np.isnan(m.fill_value)
        np.testing.assert_array_equal(zarrlite.read_full(m), vals)
        # window crossing the chunk boundary
        np.testing.assert_array_equal(
            zarrlite.read_region(m, {"x": 3}, {"x": 4}), vals[3:7]
        )
        # narrowing-astype delta
        np.testing.assert_array_equal(
            zarrlite.read_full(zarrlite.open_array(path, "w")), big
        )

    def test_foreign_filtered_store_through_spark(self, spark, tmp_path):
        path, vals, big = self._foreign_store(tmp_path)
        got = zarr_io.from_zarr(spark, path).collect()
        np.testing.assert_array_equal(got.data_vars["v"].values, vals)
        np.testing.assert_array_equal(got.data_vars["w"].values, big)
        np.testing.assert_array_equal(got.coords["x"].values, np.arange(10))

    def test_roundtrip_back_into_foreign_layout(self, tmp_path):
        """Writing through our writer with the same filter chain produces
        chunks a numcodecs decoder would accept: re-encode the expected
        payload independently and compare the stored bytes."""
        import json
        import zlib

        path, vals, _big = self._foreign_store(tmp_path)
        d = str(tmp_path / "ours")
        zarrlite.create_group(d, {}, zarr_format=2)
        m = zarrlite.create_array(
            d, "v", shape=(10,), chunks=(5,), dtype="<f8", dims=("x",),
            compressor={"id": "zlib", "level": 1},
            filters=[
                {"id": "fixedscaleoffset", "scale": 1000, "offset": 0.0,
                 "dtype": "<f8", "astype": "<i4"},
                {"id": "delta", "dtype": "<i4"},
            ],
        )
        zarrlite.write_full(m, vals)
        for ci in range(2):
            ours = zlib.decompress(
                (tmp_path / "ours" / "v" / str(ci)).read_bytes()
            )
            theirs = zlib.decompress(
                (tmp_path / "foreign_numcodecs" / "v" / str(ci)).read_bytes()
            )
            assert ours == theirs  # byte-identical filtered payloads
        # and our .zarray re-parses under the foreign field expectations
        doc = json.loads((tmp_path / "ours" / "v" / ".zarray").read_text())
        assert doc["filters"][0]["id"] == "fixedscaleoffset"
        assert doc["filters"][1]["id"] == "delta"
        assert all("dtype" in f and "astype" in f for f in doc["filters"])


def test_open_zarr_inconsistent_chunks_raises(spark, tmp_path):
    # reference zarr_test.py:46-59: two variables chunked differently
    # along a shared dim. Divisible grids ({5,10}) keep the exact finest
    # grid as the default (the foreign-filter fixture relies on it);
    # NON-divisible grids would make the gcd a guess (gcd(2,3)=1 — task
    # count explosion), so those raise; an explicit in-flight chunking
    # opts back in (regions assemble across store chunks).
    d = str(tmp_path / "store")
    zarrlite.create_group(d)
    zarrlite.create_array(d, "foo", shape=(6,), chunks=(2,), dtype="<i8", dims=("x",))
    zarrlite.create_array(d, "bar", shape=(6,), chunks=(3,), dtype="<i8", dims=("x",))
    zarrlite.consolidate_metadata(d)
    with pytest.raises(ValueError, match="inconsistent chunk sizes .* 'x'"):
        zarr_io.open_zarr_template(d)
    arrays, _ = zarrlite.open_group(d)
    zarrlite.write_region(arrays["foo"], {"x": 0}, np.arange(6))
    zarrlite.write_region(arrays["bar"], {"x": 0}, np.arange(6) * 10)
    back = zarr_io.from_zarr(spark, d, chunks={"x": 6}).collect()
    np.testing.assert_array_equal(back.data_vars["foo"].values, np.arange(6))
    np.testing.assert_array_equal(back.data_vars["bar"].values, np.arange(6) * 10)


def test_shard_extent_round_up_and_minus_one(spark, tmp_path):
    """Oversize shard requests clamp to the whole dim rounded UP to a
    chunk multiple (clamping to the raw dim size would violate the v3
    shards-divisible-by-chunks rule whenever chunks don't divide the
    dim); zarr_shards={'d': -1} = whole dim in one shard (reference
    zarr_test.py:383-404). The final partial shard reads/writes like a
    final partial chunk."""
    from xarray_beam_spark.dataset import Template

    t = Template(sizes={"x": 5}, var_meta={"foo": (("x",), "<f8")}, coords={}, attrs={})
    d = str(tmp_path / "oversize")
    zarr_io.setup_zarr(t, d, {"x": 2}, None, 3, {"x": 8})
    arrays, _ = zarrlite.open_group(d)
    assert arrays["foo"].shards == (6,)  # ceil(5/2)*2, not min(8,5)=5
    zarrlite.write_region(arrays["foo"], {"x": 0}, np.arange(5.0))
    np.testing.assert_array_equal(
        zarrlite.read_region(arrays["foo"], {}, {}), np.arange(5.0)
    )
    d2 = str(tmp_path / "minus1")
    zarr_io.setup_zarr(t, d2, {"x": 2}, None, 3, {"x": -1})
    arrays2, _ = zarrlite.open_group(d2)
    assert arrays2["foo"].shards == (6,)
    # the Dataset-level multiplier spelling clamps the same way
    src = NDDataset({"foo": (("x",), np.arange(5.0))})
    d3 = str(tmp_path / "mult")
    Dataset.from_numpy(spark, src, chunks={"x": 5}).to_zarr(
        d3, zarr_chunks={"x": 2}, zarr_format=3, zarr_chunks_per_shard={"x": 4}
    )
    arrays3, _ = zarrlite.open_group(d3)
    assert arrays3["foo"].shards == (6,)
    back = zarr_io.from_zarr(spark, d3).collect()
    np.testing.assert_array_equal(back.data_vars["foo"].values, np.arange(5.0))


class TestForeignChunkKeyEncodings:
    """Foreign stores spelling chunk keys differently (v2
    dimension_separator "/", v3 chunk_key_encoding "v2"/"."): ignoring
    the field would silently read every chunk as missing -> fill values.
    Fixtures are written byte-by-byte the way zarr-python spells them."""

    def test_v2_slash_separator_reads_and_region_writes(self, tmp_path):
        import json
        import zlib

        d = tmp_path / "store"
        (d / "v" / "0").mkdir(parents=True)
        (d / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
        arr = np.arange(12, dtype="<i8").reshape(2, 6)
        meta = {
            "zarr_format": 2, "shape": [2, 6], "chunks": [2, 3],
            "dtype": "<i8", "compressor": {"id": "zlib", "level": 1},
            "fill_value": 0, "order": "C", "filters": None,
            "dimension_separator": "/",
        }
        (d / "v" / ".zarray").write_text(json.dumps(meta))
        (d / "v" / ".zattrs").write_text(
            json.dumps({"_ARRAY_DIMENSIONS": ["x", "y"]})
        )
        for ci, sl in ((0, np.s_[:, 0:3]), (1, np.s_[:, 3:6])):
            (d / "v" / "0" / str(ci)).write_bytes(
                zlib.compress(np.ascontiguousarray(arr[sl]).tobytes())
            )
        m = zarrlite.open_array(str(d), "v")
        assert m.key_separator == "/"
        np.testing.assert_array_equal(zarrlite.read_full(m), arr)
        # a region write through the parsed meta lands on the SAME keys
        zarrlite.write_region(m, {"x": 0, "y": 0}, arr[:, 0:3] * 10)
        assert (d / "v" / "0" / "0").exists()
        got = zarrlite.read_full(zarrlite.open_array(str(d), "v"))
        np.testing.assert_array_equal(got[:, 0:3], arr[:, 0:3] * 10)
        np.testing.assert_array_equal(got[:, 3:6], arr[:, 3:6])

    def test_v2_unknown_separator_rejected(self, tmp_path):
        import json

        d = tmp_path / "store"
        (d / "v").mkdir(parents=True)
        (d / "v" / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<i8",
            "compressor": None, "fill_value": 0, "order": "C",
            "filters": None, "dimension_separator": "-",
        }))
        with pytest.raises(ValueError, match="dimension_separator"):
            zarrlite.open_array(str(d), "v")

    def test_v3_v2_style_keys_read(self, tmp_path):
        import json

        d = tmp_path / "store"
        (d / "v").mkdir(parents=True)
        (d / "zarr.json").write_text(json.dumps(
            {"zarr_format": 3, "node_type": "group", "attributes": {}}
        ))
        arr = np.arange(6, dtype="<i4")
        (d / "v" / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [6],
            "data_type": "int32",
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [3]}},
            "chunk_key_encoding": {"name": "v2", "configuration": {"separator": "."}},
            "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
            "fill_value": 0, "dimension_names": ["x"],
        }))
        (d / "v" / "0").write_bytes(arr[:3].tobytes())
        (d / "v" / "1").write_bytes(arr[3:].tobytes())
        m = zarrlite.open_array(str(d), "v")
        assert m.key_encoding == "v2" and m.key_separator == "."
        np.testing.assert_array_equal(zarrlite.read_full(m), arr)

    def test_v3_dot_separator_default_encoding(self, tmp_path):
        import json

        d = tmp_path / "store"
        (d / "v").mkdir(parents=True)
        arr = np.arange(6, dtype="<i4")
        (d / "v" / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [6],
            "data_type": "int32",
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [3]}},
            "chunk_key_encoding": {"name": "default", "configuration": {"separator": "."}},
            "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
            "fill_value": 0, "dimension_names": ["x"],
        }))
        (d / "v" / "c.0").write_bytes(arr[:3].tobytes())
        (d / "v" / "c.1").write_bytes(arr[3:].tobytes())
        m = zarrlite.open_array(str(d), "v")
        np.testing.assert_array_equal(zarrlite.read_full(m), arr)


class TestForeignInteropGuards:
    """Spec divergences an own-engine round-trip cannot catch (r14
    interop review): foreign-writer layouts our reader must honor or
    refuse loudly, and own-writer outputs a strict external reader
    would reject."""

    def test_v3_hex_float_fill_decodes_bit_pattern(self):
        import numpy as np

        from xarray_beam_spark.sources import zarrlite

        got = zarrlite._decode_fill("0x7fc00000", np.dtype("<f4"))
        assert np.isnan(got)
        got = zarrlite._decode_fill("0x3ff0000000000000", np.dtype("<f8"))
        assert got == 1.0
        with pytest.raises(ValueError, match="fill_value"):
            zarrlite._decode_fill("bogus", np.dtype("<f4"))

    def test_v2_base64_bytes_fill_decodes(self):
        import numpy as np

        from xarray_beam_spark.sources import zarrlite

        # v2 spec: fixed-length bytes fills are base64, not literal text
        assert zarrlite._decode_fill("AAAAAAAAAAA=", np.dtype("|S8")) == b"\x00" * 8

    def test_v3_multi_compressor_chain_refuses(self):
        from xarray_beam_spark.sources import zarrlite

        with pytest.raises(ValueError, match="multiple compression"):
            zarrlite._compressor_from_v3_codecs(
                "v", [{"name": "bytes"}, {"name": "gzip"}, {"name": "zstd"}]
            )

    def test_v3_unknown_data_type_is_named(self):
        from xarray_beam_spark.sources import zarrlite

        meta = {
            "zarr_format": 3, "node_type": "array", "data_type": "r42",
            "shape": [4], "chunk_grid": {"configuration": {"chunk_shape": [4]}},
            "codecs": [{"name": "bytes"}],
        }
        with pytest.raises(ValueError, match="data_type"):
            zarrlite._zarray_from_v3_meta("/nope", "v", meta)
        # float16 / complex are v3 CORE types and must resolve
        import numpy as np

        for dt, np_str in (("float16", "<f2"), ("complex64", "<c8")):
            assert np.dtype(zarrlite._V3_DTYPES[dt]).str == np_str

    def test_null_dimension_separator_means_default(self, tmp_path):
        import json

        import numpy as np

        from xarray_beam_spark.sources import zarrlite

        p = str(tmp_path / "s")
        zarrlite.create_group(p)
        zarrlite.create_array(p, "v", shape=(4,), chunks=(4,), dtype="<i8",
                              dims=("x",))
        meta_path = f"{p}/v/.zarray"
        doc = json.loads(open(meta_path).read())
        doc["dimension_separator"] = None  # some writers emit the key as null
        open(meta_path, "w").write(json.dumps(doc))
        arr = zarrlite.open_array(p, "v")
        zarrlite.write_region(arr, {"x": 0}, np.arange(4))
        assert list(zarrlite.read_full(arr)) == [0, 1, 2, 3]

    def test_metadata_json_never_carries_bare_nan(self, tmp_path):
        from xarray_beam_spark.sources import zarrlite

        # bare NaN literals are invalid JSON; strict foreign parsers
        # reject the whole document — refuse at write time instead
        with pytest.raises(ValueError):
            zarrlite.create_group(str(tmp_path / "g"), attrs={"x": float("nan")})

    def test_netcdf3_zero_dim_write_refuses(self):
        import numpy as np

        from xarray_beam_spark.ndarray_ds import NDDataset
        from xarray_beam_spark.sources import netcdf3

        ds = NDDataset({"v": (("a", "b"), np.zeros((3, 0)))}, {})
        with pytest.raises(ValueError, match="zero-length"):
            netcdf3.dumps(ds)

    def test_netcdf3_foreign_attrs_survive(self):
        import struct as st

        import numpy as np

        from xarray_beam_spark.sources import netcdf3

        # hand-built minimal classic file: 1 dim, 1 short var with CF
        # packing attrs + a latin-1 units string, 1 global attr
        def name(s):
            b = s.encode()
            return st.pack(">i", len(b)) + b + b"\x00" * (-len(b) % 4)

        def att_text(nm, raw):
            return name(nm) + st.pack(">ii", 2, len(raw)) + raw + b"\x00" * (-len(raw) % 4)

        def att_short(nm, val):
            return name(nm) + st.pack(">ii", 3, 1) + st.pack(">h", val) + b"\x00\x00"

        def att_double(nm, val):
            return name(nm) + st.pack(">ii", 6, 1) + st.pack(">d", val)

        head = b"CDF\x01" + st.pack(">i", 0)
        head += st.pack(">ii", 0x0A, 1) + name("x") + st.pack(">i", 2)
        head += st.pack(">ii", 0x0C, 1) + att_text("title", b"legacy")
        vatts = (
            st.pack(">ii", 0x0C, 3)
            + att_double("scale_factor", 0.01)
            + att_short("_FillValue", -999)
            + att_text("units", b"\xb0C")  # latin-1 degree sign
        )
        data = st.pack(">hh", 100, 200)
        # var: name, ndims, dimids, atts, type(short), vsize, begin
        var = name("t") + st.pack(">i", 1) + st.pack(">i", 0) + vatts
        var += st.pack(">ii", 3, 4)
        begin_off_placeholder = len(head) + st.pack(">i", 0).__len__()  # computed below
        head_vars = st.pack(">ii", 0x0B, 1)
        begin = len(head) + len(head_vars) + len(var) + 4  # + begin field itself
        blob = head + head_vars + var + st.pack(">i", begin) + data
        ds = netcdf3.loads(blob)
        assert ds.attrs["title"] == "legacy"
        va = ds.attrs["variable_attributes"]["t"]
        assert va["scale_factor"] == [0.01]
        assert va["_FillValue"] == [-999]
        assert va["units"] == "\xb0C"
        assert list(ds.data_vars["t"].values) == [100, 200]
