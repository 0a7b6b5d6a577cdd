"""``to_zarr(append_dim=...)`` — grow-and-region-write ingestion.

Semantics follow xarray's ``Dataset.to_zarr(append_dim=)`` on top of the
reference's incremental-write machinery (``zarr.py:149-226,700-716``):
metadata-only resize, coordinate extension, then an aligned region write
of the new extent.
"""

from __future__ import annotations

import numpy as np
import pytest

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.sources import zarr_io, zarrlite


def _series(nt=20, nx=7, seed=42) -> NDDataset:
    rng = np.random.default_rng(seed)
    return NDDataset(
        data_vars={
            "temp": (("time", "x"), rng.normal(size=(nt, nx)).astype(np.float32)),
            "count": (("time", "x"), rng.integers(0, 100, size=(nt, nx)).astype(np.int64)),
        },
        coords={
            "time": np.arange("2020-01-01", nt, dtype="datetime64[D]").astype("datetime64[us]"),
            "x": np.arange(nx, dtype=np.int64),
        },
    )


class TestResizeArray:
    def test_grow_reads_fill(self, tmp_path):
        path = str(tmp_path / "s")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "a", shape=(4,), chunks=(2,), dtype=np.float64, dims=("t",)
        )
        zarrlite.write_full(meta, np.arange(4.0))
        meta2 = zarrlite.resize_array(meta, (8,))
        got = zarrlite.read_full(meta2)
        assert got.shape == (8,)
        np.testing.assert_array_equal(got[:4], np.arange(4.0))
        assert np.isnan(got[4:]).all()
        # reopening sees the new shape too
        reopened = zarrlite.open_array(path, "a")
        assert reopened.shape == (8,)

    def test_shrink_rejected(self, tmp_path):
        path = str(tmp_path / "s")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "a", shape=(4,), chunks=(2,), dtype=np.float64, dims=("t",)
        )
        with pytest.raises(ValueError, match="shrinks"):
            zarrlite.resize_array(meta, (2,))

    def test_rank_mismatch_rejected(self, tmp_path):
        path = str(tmp_path / "s")
        zarrlite.create_group(path)
        meta = zarrlite.create_array(
            path, "a", shape=(4,), chunks=(2,), dtype=np.float64, dims=("t",)
        )
        with pytest.raises(ValueError, match="rank"):
            zarrlite.resize_array(meta, (4, 4))

    def test_v3_resize(self, tmp_path):
        path = str(tmp_path / "s")
        zarrlite.create_group(path, zarr_format=3)
        meta = zarrlite.create_array(
            path, "a", shape=(4,), chunks=(2,), dtype=np.int64, dims=("t",),
            zarr_format=3, fill_value=0,
        )
        zarrlite.write_full(meta, np.arange(4))
        meta2 = zarrlite.resize_array(meta, (6,))
        got = zarrlite.read_full(meta2)
        np.testing.assert_array_equal(got, [0, 1, 2, 3, 0, 0])


class TestAppendToZarr:
    @pytest.mark.parametrize("zarr_format", [2, 3])
    def test_roundtrip(self, spark, tmp_path, zarr_format):
        src = _series(nt=20)
        path = str(tmp_path / "ap")
        first = Dataset.from_numpy(spark, src.isel({"time": slice(0, 12)}), chunks={"time": 4})
        second = Dataset.from_numpy(spark, src.isel({"time": slice(12, 20)}), chunks={"time": 4})
        zarr_io.to_zarr(first, path, zarr_chunks={"time": 4, "x": 7}, zarr_format=zarr_format)
        zarr_io.to_zarr(second, path, append_dim="time")
        got = zarr_io.from_zarr(spark, path).collect()
        assert got.equals(src)

    def test_append_trailing_partial_chunk(self, spark, tmp_path):
        """The appended slice may end mid-chunk (array edge is a legal
        region end); only the append ORIGIN must be unit-aligned."""
        src = _series(nt=15)
        path = str(tmp_path / "ap")
        first = Dataset.from_numpy(spark, src.isel({"time": slice(0, 8)}), chunks={"time": 4})
        second = Dataset.from_numpy(spark, src.isel({"time": slice(8, 15)}), chunks={"time": 4})
        zarr_io.to_zarr(first, path, zarr_chunks={"time": 4, "x": 7})
        zarr_io.to_zarr(second, path, append_dim="time")
        got = zarr_io.from_zarr(spark, path).collect()
        assert got.equals(src)

    def test_unaligned_store_extent_rejected(self, spark, tmp_path):
        src = _series(nt=14)
        path = str(tmp_path / "ap")
        first = Dataset.from_numpy(spark, src.isel({"time": slice(0, 10)}), chunks={"time": 10})
        second = Dataset.from_numpy(spark, src.isel({"time": slice(10, 14)}), chunks={"time": 4})
        zarr_io.to_zarr(first, path, zarr_chunks={"time": 4, "x": 7})
        # store extent 10 is mid-chunk for zarr chunk 4 → appending would
        # have to fill a partial chunk some other task wrote
        with pytest.raises(ValueError, match="write unit"):
            zarr_io.to_zarr(second, path, append_dim="time")

    def test_missing_variable_rejected(self, spark, tmp_path):
        src = _series(nt=8)
        path = str(tmp_path / "ap")
        d = Dataset.from_numpy(spark, src, chunks={"time": 4})
        zarr_io.to_zarr(d, path, zarr_chunks={"time": 4, "x": 7})
        only_temp = NDDataset(
            data_vars={"temp": (("time", "x"), np.ones((4, 7), np.float32))},
            coords={
                "time": (np.datetime64("2020-03-01", "D") + np.arange(4)).astype("datetime64[us]"),
                "x": np.arange(7, dtype=np.int64),
            },
        )
        part = Dataset.from_numpy(spark, only_temp, chunks={"time": 4})
        with pytest.raises(ValueError, match="lacks"):
            zarr_io.to_zarr(part, path, append_dim="time")

    def test_static_var_left_untouched(self, spark, tmp_path):
        """A store variable without the append dim (e.g. topography) stays
        valid and unmodified across appends."""
        rng = np.random.default_rng(7)
        full = NDDataset(
            data_vars={
                "temp": (("time", "x"), rng.normal(size=(8, 5)).astype(np.float64)),
                "static": (("x",), rng.normal(size=5)),
            },
            coords={
                "time": np.arange("2021-01-01", 8, dtype="datetime64[D]").astype("datetime64[us]"),
                "x": np.arange(5, dtype=np.int64),
            },
        )
        path = str(tmp_path / "ap")
        d0 = Dataset.from_numpy(spark, full.isel({"time": slice(0, 4)}), chunks={"time": 4})
        zarr_io.to_zarr(d0, path, zarr_chunks={"time": 4, "x": 5})
        tail = full.isel({"time": slice(4, 8)})
        tail_only_time = NDDataset(
            data_vars={"temp": tail.data_vars["temp"]},
            coords=tail.coords,
        )
        d1 = Dataset.from_numpy(spark, tail_only_time, chunks={"time": 4})
        zarr_io.to_zarr(d1, path, append_dim="time")
        got = zarr_io.from_zarr(spark, path).collect()
        assert got.equals(full)

    def test_missing_append_dim_in_var_rejected(self, spark, tmp_path):
        rng = np.random.default_rng(7)
        full = NDDataset(
            data_vars={
                "temp": (("time", "x"), rng.normal(size=(4, 5))),
                "static": (("x",), rng.normal(size=5)),
            },
            coords={"x": np.arange(5, dtype=np.int64)},
        )
        path = str(tmp_path / "ap")
        d0 = Dataset.from_numpy(spark, full, chunks={"time": 4})
        zarr_io.to_zarr(d0, path, zarr_chunks={"time": 4, "x": 5})
        d1 = Dataset.from_numpy(spark, full, chunks={"time": 4})
        with pytest.raises(ValueError, match="project static variables"):
            zarr_io.to_zarr(d1, path, append_dim="time")

    def test_coordinate_presence_must_agree(self, spark, tmp_path):
        src = _series(nt=8)
        path = str(tmp_path / "ap")
        d0 = Dataset.from_numpy(spark, src, chunks={"time": 4})
        zarr_io.to_zarr(d0, path, zarr_chunks={"time": 4, "x": 7})
        unlabelled = NDDataset(
            data_vars={
                "temp": (("time", "x"), np.ones((4, 7), np.float32)),
                "count": (("time", "x"), np.ones((4, 7), np.int64)),
            },
            coords={"x": np.arange(7, dtype=np.int64)},
        )
        d1 = Dataset.from_numpy(spark, unlabelled, chunks={"time": 4})
        with pytest.raises(ValueError, match="coordinate"):
            zarr_io.to_zarr(d1, path, append_dim="time")

    def test_append_options_mutually_exclusive(self, spark, tmp_path):
        src = _series(nt=8)
        d = Dataset.from_numpy(spark, src, chunks={"time": 4})
        with pytest.raises(ValueError, match="mutually exclusive"):
            zarr_io.to_zarr(d, str(tmp_path / "x"), append_dim="time", origin={"time": 4})

    def test_double_append(self, spark, tmp_path):
        """Three successive jobs build one store — the streaming-ingest
        shape (new day arrives → one append job)."""
        src = _series(nt=24)
        path = str(tmp_path / "ap")
        parts = [src.isel({"time": slice(a, b)}) for a, b in [(0, 8), (8, 16), (16, 24)]]
        zarr_io.to_zarr(
            Dataset.from_numpy(spark, parts[0], chunks={"time": 4}),
            path, zarr_chunks={"time": 4, "x": 7},
        )
        for p in parts[1:]:
            zarr_io.to_zarr(Dataset.from_numpy(spark, p, chunks={"time": 4}), path, append_dim="time")
        got = zarr_io.from_zarr(spark, path).collect()
        assert got.equals(src)


class TestAppendProperties:
    def test_sharded_v3_append_uses_shard_unit(self, spark, tmp_path):
        """With v3 shards the write unit is the SHARD: an old extent that
        is chunk-aligned but not shard-aligned must be rejected, and a
        shard-aligned append must round-trip."""
        src = _series(nt=24)
        path = str(tmp_path / "sh")
        first = Dataset.from_numpy(spark, src.isel({"time": slice(0, 16)}), chunks={"time": 8})
        zarr_io.to_zarr(
            first, path, zarr_chunks={"time": 4, "x": 7},
            zarr_format=3, zarr_chunks_per_shard={"time": 2},  # shard = 8
        )
        second = Dataset.from_numpy(spark, src.isel({"time": slice(16, 24)}), chunks={"time": 8})
        zarr_io.to_zarr(second, path, append_dim="time")
        got = zarr_io.from_zarr(spark, path).collect()
        assert got.equals(src)

        # now build a store whose extent is chunk- but not shard-aligned
        path2 = str(tmp_path / "sh2")
        first2 = Dataset.from_numpy(spark, src.isel({"time": slice(0, 12)}), chunks={"time": 8})
        zarr_io.to_zarr(
            first2, path2, zarr_chunks={"time": 4, "x": 7},
            zarr_format=3, zarr_chunks_per_shard={"time": 2},  # shard 8; 12 % 8 != 0
        )
        with pytest.raises(ValueError, match="write unit"):
            zarr_io.to_zarr(second, path2, append_dim="time")

    def test_random_aligned_splits_roundtrip(self, spark, tmp_path):
        """Property: for any zarr chunk c and any c-aligned split point,
        write-then-append equals a single full write (random cases drawn
        here instead of Hypothesis: each case spins Spark jobs, so we
        bound the count)."""
        import random

        rng = random.Random(23)
        for case in range(4):
            nt = rng.choice([10, 12, 16, 18])
            c = rng.choice([2, 3, 4])
            n_units = nt // c
            if n_units < 2:
                continue
            cut = c * rng.randrange(1, n_units)
            src = _series(nt=nt, seed=case)
            path = str(tmp_path / f"p{case}")
            a = Dataset.from_numpy(spark, src.isel({"time": slice(0, cut)}), chunks={"time": c})
            b = Dataset.from_numpy(spark, src.isel({"time": slice(cut, nt)}), chunks={"time": c})
            zarr_io.to_zarr(a, path, zarr_chunks={"time": c, "x": 7})
            zarr_io.to_zarr(b, path, append_dim="time")
            got = zarr_io.from_zarr(spark, path).collect()
            assert got.equals(src), (nt, c, cut)


class TestRound12Regressions:
    def _mk(self, spark, tmp_path, n=8):
        nd = NDDataset(
            {"v": (("t", "x"), np.arange(n * 8, dtype=np.float64).reshape(n, 8))},
            coords={"t": np.arange(n, dtype=np.int64),
                    "x": np.arange(8, dtype=np.int64)},
        )
        p = str(tmp_path / "s")
        zarr_io.to_zarr(
            Dataset.from_numpy(spark, nd, chunks={"t": 4, "x": 8}), p
        )
        return p, nd

    def test_transposed_variable_write_rejected(self, spark, tmp_path):
        """A square grid passes every size/alignment check — the dim-order
        check is the only thing between a transposed dataset and silently
        corrupted chunks."""
        nd = NDDataset(
            {"v": (("t", "x"), np.zeros((8, 8)))},
            coords={"t": np.arange(8, dtype=np.int64),
                    "x": np.arange(8, dtype=np.int64)},
        )
        p = str(tmp_path / "sq")
        zarr_io.to_zarr(Dataset.from_numpy(spark, nd, chunks={"t": 4, "x": 4}), p)
        swapped = NDDataset(
            {"v": (("x", "t"), np.ones((8, 8)))},
            coords=nd.coords,
        )
        with pytest.raises(ValueError, match="store dims"):
            zarr_io.to_zarr(
                Dataset.from_numpy(spark, swapped, chunks={"x": 4, "t": 4}),
                p,
                needs_setup=False,
            )

    def test_origin_typo_rejected(self, spark, tmp_path):
        """An unknown origin dim used to be silently dropped — the slice
        landed at offset 0 over existing data."""
        p, nd = self._mk(spark, tmp_path)
        half = NDDataset(
            {"v": (("t", "x"), np.zeros((4, 8)))},
            coords={"t": np.arange(4, dtype=np.int64), "x": nd.coords["x"]},
        )
        ds = Dataset.from_numpy(spark, half, chunks={"t": 4, "x": 8})
        with pytest.raises(ValueError, match="origin names dims"):
            zarr_io.to_zarr(ds, p, needs_setup=False, origin={"tiem": 4})

    def test_append_preserves_coord_attrs_and_cf(self, spark, tmp_path):
        """Appending extends a CF-packed/attributed coordinate in the
        DECODED domain and keeps its attrs — previously attrs vanished
        and the old half kept raw packed codes."""
        p, nd = self._mk(spark, tmp_path, n=4)
        # retrofit CF packing + a units attr onto the t coordinate
        packed = zarrlite.create_array(
            p, "t", shape=(4,), chunks=(4,), dtype=np.int32, dims=("t",),
            attrs={"scale_factor": 0.5, "add_offset": 10.0, "units": "days"},
        )
        zarrlite.write_full(packed, np.array([0, 1, 2, 3], dtype=np.int32))
        zarrlite.consolidate_metadata(p)
        # decoded labels are 10.0, 10.5, 11.0, 11.5; append 12.0, 12.5
        nxt = NDDataset(
            {"v": (("t", "x"), np.zeros((2, 8)))},
            coords={"t": np.array([12.0, 12.5]), "x": nd.coords["x"]},
        )
        zarr_io.append_to_zarr(
            Dataset.from_numpy(spark, nxt, chunks={"t": 2, "x": 8}), p, "t"
        )
        cmeta2 = zarrlite.open_array(p, "t")
        assert cmeta2.attrs.get("units") == "days"
        assert cmeta2.attrs.get("scale_factor") == 0.5
        got = zarr_io.read_region_decoded(cmeta2, {"t": 0}, {"t": 6})
        np.testing.assert_array_equal(
            got, [10.0, 10.5, 11.0, 11.5, 12.0, 12.5]
        )
        # stored codes stay int32-packed end to end
        raw = zarrlite.read_full(cmeta2)
        assert raw.dtype == np.int32
        np.testing.assert_array_equal(raw, [0, 1, 2, 3, 4, 5])

    def test_fillvalue_on_datetime_coord_not_cf_decoded(self, tmp_path):
        """_FillValue on a non-numeric dtype is a mask hint, not CF
        packing — the float64 decode detour corrupted datetimes."""
        path = str(tmp_path / "dt")
        zarrlite.create_group(path)
        vals = np.array(["2024-01-01", "2024-01-02"], dtype="datetime64[us]")
        meta = zarrlite.create_array(
            path, "time", shape=(2,), chunks=(2,), dtype=vals.dtype,
            dims=("time",), attrs={"_FillValue": "NaT"},
        )
        zarrlite.write_full(meta, vals)
        got = zarr_io.read_region_decoded(meta, {"time": 0}, {"time": 2})
        assert got.dtype == vals.dtype
        np.testing.assert_array_equal(got, vals)

    def test_window_dim_dropped_by_var_subset(self, spark, tmp_path):
        """isel-then-getitem: the rewritten scan's window may reference a
        dim the projection removed — xarray semantics say ignore it."""
        nd = NDDataset(
            {
                "temp": (("t", "x"), np.zeros((8, 4))),
                "static": (("x",), np.arange(4, dtype=np.float64)),
            },
            coords={"t": np.arange(8, dtype=np.int64),
                    "x": np.arange(4, dtype=np.int64)},
        )
        p = str(tmp_path / "sub")
        zarr_io.to_zarr(Dataset.from_numpy(spark, nd, chunks={"t": 4, "x": 4}), p)
        ds = zarr_io.from_zarr(spark, p)
        out = ds.isel(t=slice(0, 5))[["static"]].collect()
        np.testing.assert_array_equal(
            out.data_vars["static"].values, np.arange(4, dtype=np.float64)
        )

    def test_zlib_level_preserved(self, tmp_path):
        path = str(tmp_path / "z")
        zarrlite.create_group(path)
        rng = np.random.default_rng(0)
        data = np.repeat(rng.normal(size=512), 16)  # compressible
        m1 = zarrlite.create_array(
            path, "a", shape=data.shape, chunks=data.shape,
            dtype=data.dtype, dims=("i",),
            compressor={"id": "zlib", "level": 9},
        )
        zarrlite.write_full(m1, data)
        back = zarrlite.read_full(zarrlite.open_array(path, "a"))
        np.testing.assert_array_equal(back, data)
        reopened = zarrlite.open_array(path, "a")
        assert reopened.compressor == {"id": "zlib", "level": 9}

    def test_v3_foreign_index_location_rejected_at_open(self, tmp_path):
        import json as _json
        import os

        path = str(tmp_path / "v3")
        zarrlite.create_group(path, zarr_format=3)
        meta = zarrlite.create_array(
            path, "a", shape=(4,), chunks=(2,), dtype=np.float64,
            dims=("t",), zarr_format=3, shards=(4,),
        )
        zpath = os.path.join(path, "a", "zarr.json")
        doc = _json.loads(open(zpath).read())
        doc["codecs"][0]["configuration"]["index_location"] = "start"
        open(zpath, "w").write(_json.dumps(doc))
        with pytest.raises(ValueError, match="index_location"):
            zarrlite.open_array(path, "a")
