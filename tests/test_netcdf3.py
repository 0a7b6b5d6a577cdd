"""NetCDF3 classic container: byte-format compliance + per-chunk sink/source.

Reference parity: docs/read-write.ipynb "one netCDF file per chunk" write
DoFn + custom loader, re-expressed as distributed mapInPandas over chunk
rows with a from-spec CDF-2 codec (no netCDF lib in this container).
"""

import struct

import numpy as np
import pytest

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.sources import netcdf3


def _rt(ds: NDDataset) -> NDDataset:
    return netcdf3.loads(netcdf3.dumps(ds))


class TestCodec:
    def test_roundtrip_all_dtypes(self):
        rng = np.random.default_rng(7)
        ds = NDDataset(
            {
                "f8": (("x", "y"), rng.normal(size=(3, 4))),
                "f4": (("x",), rng.normal(size=3).astype(np.float32)),
                "i4": (("y",), np.arange(4, dtype=np.int32)),
                "i2": (("y",), np.arange(4, dtype=np.int16)),
                "i1": (("y",), np.arange(4, dtype=np.int8)),
                "u2": (("y",), np.arange(4, dtype=np.uint16)),
                "b": (("x",), np.array([True, False, True])),
                "i8": (("x",), np.array([2**40 + 3, -(2**35), 7], dtype=np.int64)),
                "scalar": ((), np.float64(2.5)),
            },
            coords={
                "x": np.array(["2024-01-01", "2024-01-02", "2024-01-03"], "datetime64[us]"),
                "y": np.array(["alpha", "b", "céd", "dd"]),  # non-ASCII utf-8
            },
            attrs={"title": "netcdf3 parity", "level": 3},
        )
        back = _rt(ds)
        assert set(back.data_vars) == set(ds.data_vars)
        for k, v in ds.data_vars.items():
            got = back.data_vars[k]
            assert got.dims == v.dims
            assert got.values.dtype == v.values.dtype, k
            np.testing.assert_array_equal(got.values, v.values)
        for k, v in ds.coords.items():
            np.testing.assert_array_equal(back.coords[k].values, v.values)
            assert back.coords[k].values.dtype == v.values.dtype
        assert back.attrs == {"title": "netcdf3 parity", "level": 3}

    def test_int64_bit_exact_extremes(self):
        vals = np.array([np.iinfo(np.int64).min, -1, 0, 1, np.iinfo(np.int64).max])
        ds = NDDataset({"v": (("x",), vals)})
        np.testing.assert_array_equal(_rt(ds).data_vars["v"].values, vals)

    def test_header_is_spec_shaped(self):
        ds = NDDataset({"v": (("x",), np.arange(3.0))}, {"x": np.arange(3.0)})
        buf = netcdf3.dumps(ds)
        assert buf[:4] == b"CDF\x02"
        numrecs, tag, ndims = struct.unpack(">iii", buf[4:16])
        assert numrecs == 0 and tag == 0x0A and ndims == 1
        # dim name 'x' follows: int32 len + padded bytes + int32 size 3
        nlen = struct.unpack(">i", buf[16:20])[0]
        assert nlen == 1 and buf[20:21] == b"x"
        assert struct.unpack(">i", buf[24:28])[0] == 3
        # big-endian doubles land on a 4-byte boundary at the recorded begin
        v = netcdf3.loads(buf)
        np.testing.assert_array_equal(v.data_vars["v"].values, np.arange(3.0))

    def test_empty_and_attrs_only(self):
        back = _rt(NDDataset({}, {}, {"note": "empty"}))
        assert back.attrs == {"note": "empty"}
        assert not back.data_vars and not back.coords

    def test_object_dtype_rejected(self):
        ds = NDDataset({"v": (("x",), np.array([{"a": 1}, None], dtype=object))})
        with pytest.raises(TypeError, match="no NetCDF3 encoding"):
            netcdf3.dumps(ds)

    def test_oversized_var_rejected(self):
        # 2**29 float64s = 4 GiB > int32 vsize; broadcast view allocates nothing
        # and the guard must fire before materialization does
        big = np.broadcast_to(np.float64(0.0), (2**29,))
        ds = NDDataset({"v": (("x",), big)})
        with pytest.raises(ValueError, match="vsize"):
            netcdf3.dumps(ds)


class TestChunkFiles:
    def test_roundtrip(self, spark, tmp_path):
        rng = np.random.default_rng(3)
        nd = NDDataset(
            {"t2m": (("time", "lat"), rng.normal(size=(20, 6)))},
            coords={
                "time": np.arange(20, dtype=np.int64) * 3600,
                "lat": np.linspace(-60, 60, 6),
            },
            attrs={"src": "test"},
        )
        ds = Dataset.from_numpy(spark, nd, chunks={"time": 5})
        out = str(tmp_path / "nc")
        stats = netcdf3.to_netcdf_files(ds, out)
        assert stats["chunks_written"] == 4 and stats["bytes_written"] > 0
        back = netcdf3.from_netcdf_files(spark, out, validate=True)
        got = back.collect()
        assert got.equals(nd)
        # every chunk file is independently parseable netCDF3
        files = sorted((tmp_path / "nc" / "chunks").iterdir())
        assert len(files) == 4 and all(f.name.endswith(".nc") for f in files)
        one = netcdf3.loads(files[0].read_bytes())
        assert one.sizes == {"time": 5, "lat": 6}
        assert "time" in one.coords and "lat" in one.coords

    def test_roundtrip_split_vars(self, spark, tmp_path):
        rng = np.random.default_rng(5)
        nd = NDDataset(
            {
                "a": (("x",), rng.normal(size=12)),
                "b": (("x",), rng.normal(size=12)),
            },
            coords={"x": np.arange(12)},
        )
        ds = Dataset.from_numpy(spark, nd, chunks={"x": 6}).split_variables()
        out = str(tmp_path / "ncsv")
        stats = netcdf3.to_netcdf_files(ds, out)
        assert stats["chunks_written"] == 4  # 2 chunks x 2 vars
        back = netcdf3.from_netcdf_files(spark, out, validate=True)
        assert back.split_vars
        assert back.consolidate_variables().collect().equals(nd)

    def test_missing_meta_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            netcdf3.from_netcdf_files(spark, str(tmp_path / "nope"))

    def test_read_table_matches_unfused(self, spark, tmp_path):
        # NaNs exercise both dropna branches; a 2-var grid exercises the
        # any-var-non-NaN row-keep rule
        rng = np.random.default_rng(7)
        t2m = rng.normal(size=(10, 4))
        t2m[2, :] = np.nan  # whole rows of cells dropped under dropna
        t2m[5, 1] = np.nan
        wind = rng.normal(size=(10, 4))
        wind[5, 1] = np.nan  # both vars NaN -> cell dropped
        nd = NDDataset(
            {"t2m": (("time", "lat"), t2m), "wind": (("time", "lat"), wind)},
            coords={
                "time": np.arange(10, dtype=np.int64) * 3600,
                "lat": np.linspace(-30, 30, 4),
            },
        )
        ds = Dataset.from_numpy(spark, nd, chunks={"time": 4})
        out = str(tmp_path / "ncft")
        netcdf3.to_netcdf_files(ds, out)
        import pandas.testing as pdt

        for dropna in (True, False):
            want = (
                netcdf3.from_netcdf_files(spark, out)
                .to_table(dropna=dropna)
            )
            got = netcdf3.read_table(spark, out, dropna=dropna)
            assert got.schema == want.schema
            key = [f.name for f in got.schema.fields]
            # pandas compare: NaN == NaN (rows with NaN cells survive
            # both dropna settings here), bit-exact float check
            pdt.assert_frame_equal(
                got.orderBy(*key).toPandas(),
                want.orderBy(*key).toPandas(),
                check_exact=True,
            )
        # the fused plan has exactly ONE Python-eval node (the point)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInArrow") == 1 and "MapInPandas" not in plan

    def test_read_table_split_vars_falls_back(self, spark, tmp_path):
        rng = np.random.default_rng(9)
        nd = NDDataset(
            {
                "a": (("x",), rng.normal(size=8)),
                "b": (("x",), rng.normal(size=8)),
            },
            coords={"x": np.arange(8)},
        )
        ds = Dataset.from_numpy(spark, nd, chunks={"x": 4}).split_variables()
        out = str(tmp_path / "ncsvft")
        netcdf3.to_netcdf_files(ds, out)
        want = netcdf3.from_netcdf_files(spark, out).to_table(dropna=True)
        got = netcdf3.read_table(spark, out, dropna=True)
        assert got.schema == want.schema
        key = [f.name for f in got.schema.fields]
        assert got.orderBy(*key).collect() == want.orderBy(*key).collect()


def test_corrupted_streams_never_leak_internal_errors():
    """Failure contract (matches the image codecs): corrupted bytes parse
    or raise ValueError — struct/Index/Key/Type errors never leak."""
    import numpy as np

    from xarray_beam_spark.ndarray_ds import NDDataset

    rng = np.random.default_rng(5)
    nd = NDDataset(
        {"v": (("x",), np.arange(64.0))},
        coords={"x": np.arange(64, dtype=np.int64)},
    )
    blob = netcdf3.dumps(nd)
    for _ in range(200):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            netcdf3.loads(bytes(b))
        except ValueError:
            pass
