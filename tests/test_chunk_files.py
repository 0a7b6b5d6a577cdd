"""Per-chunk parquet sink/source (the reference's netCDF-per-chunk
pattern, ``docs/read-write.ipynb``, with XBS1 payloads in parquet)."""

from __future__ import annotations

import numpy as np
import pytest

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.sources import chunk_files


def _fixture_ds(nt=20, nx=7) -> NDDataset:
    rng = np.random.default_rng(7)
    return NDDataset(
        data_vars={
            "temp": (("time", "x"), rng.normal(size=(nt, nx)).astype(np.float32)),
            "count": (("time", "x"), rng.integers(0, 100, size=(nt, nx)).astype(np.int64)),
        },
        coords={
            "time": np.arange("2021-01-01", nt, dtype="datetime64[D]").astype("datetime64[us]"),
            "x": np.arange(nx, dtype=np.int64),
        },
        attrs={"title": "chunkfiles"},
    )


class TestChunkParquet:
    def test_roundtrip_identity(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 6, "x": 4})
        chunk_files.to_chunk_parquet(d, str(tmp_path / "cp"))
        back = chunk_files.from_chunk_parquet(spark, str(tmp_path / "cp"))
        assert back.chunks == d.chunks
        assert back.template.sizes == d.template.sizes
        got = back.collect()
        # identical (values + attrs), not the dead disjunction
        # `identical or equals` (identical implies equals): attrs must
        # survive the meta JSON round-trip too
        assert got.identical(src)

    def test_roundtrip_split_vars(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 10}, split_vars=True)
        chunk_files.to_chunk_parquet(d, str(tmp_path / "cp"))
        back = chunk_files.from_chunk_parquet(spark, str(tmp_path / "cp"))
        assert back.split_vars
        got = back.consolidate_variables().collect()
        assert got.identical(src)

    def test_reread_then_transform(self, spark, tmp_path):
        """The re-opened dataset is a first-class Dataset: rechunk + reduce."""
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 4})
        chunk_files.to_chunk_parquet(d, str(tmp_path / "cp"))
        back = chunk_files.from_chunk_parquet(spark, str(tmp_path / "cp"))
        got = back.rechunk({"time": 20}).mean("time").collect()
        np.testing.assert_allclose(
            got.data_vars["temp"].values,
            src.data_vars["temp"].values.mean(axis=0),
            rtol=1e-6,
        )

    def test_missing_meta_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            chunk_files.from_chunk_parquet(spark, str(tmp_path / "nope"))

    def test_validate_on_read(self, spark, tmp_path):
        src = _fixture_ds()
        d = Dataset.from_numpy(spark, src, chunks={"time": 6, "x": 4})
        chunk_files.to_chunk_parquet(d, str(tmp_path / "cp"))
        back = chunk_files.from_chunk_parquet(spark, str(tmp_path / "cp"), validate=True)
        assert back.collect().equals(src)
