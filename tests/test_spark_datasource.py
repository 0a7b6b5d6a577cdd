"""xbs_zarr Python DataSource: schema, values, and pushdown pruning."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In, LessThan

from xarray_beam_spark.dataset import Dataset
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.sources import spark_datasource, zarr_io


@pytest.fixture()
def store(spark, tmp_path):
    rng = np.random.default_rng(0)
    nd = NDDataset(
        {
            "t2m": (("time", "lat"), rng.normal(size=(24, 5))),
            "rain": (("lat", "time"), rng.normal(size=(5, 24))),  # transposed dims
        },
        coords={
            "time": np.arange(24, dtype=np.int64) * 3600,
            "lat": np.linspace(-60, 60, 5),
        },
    )
    p = str(tmp_path / "store")
    zarr_io.to_zarr(Dataset.from_numpy(spark, nd, chunks={"time": 6}), p)
    return p, nd


def test_read_values_and_schema(spark, store):
    p, nd = store
    spark_datasource.register(spark)
    df = spark.read.format("xbs_zarr").option("path", p).load()
    assert df.schema.simpleString() == "struct<lat:double,time:bigint,rain:double,t2m:double>"
    rows = df.orderBy("time", "lat").collect()
    assert len(rows) == 120
    # values line up per-cell across differently-ordered variable dims
    r = rows[10 * 5 + 2]  # time index 10, lat index 2
    assert r["time"] == 36000 and r["lat"] == 0.0
    assert r["t2m"] == nd.data_vars["t2m"].values[10, 2]
    assert r["rain"] == nd.data_vars["rain"].values[2, 10]


def test_filter_pushdown_prunes_partitions(spark, store):
    p, _ = store
    # target_partition_bytes=0 disables read-side auto-coarsening so the
    # test observes store-chunk-granular pruning
    src = spark_datasource.ZarrDataSource({"path": p, "target_partition_bytes": "0"})
    rd = src.reader(src.schema())
    assert len(rd.partitions()) == 4  # 24/6 time chunks x 1 lat chunk
    rd.pushFilters([GreaterThanOrEqual(("time",), 36000), LessThan(("time",), 64800)])
    parts = rd.partitions()
    spans = sorted(pt.value["time"] for pt in parts)
    assert spans == [(10, 12), (12, 18)]  # window [10, 18) clamped + chunk-aligned
    # equality on a float coord: one chunk
    rd2 = src.reader(src.schema())
    rd2.pushFilters([EqualTo(("lat",), 0.0), In(("time",), (0, 3600))])
    parts2 = rd2.partitions()
    assert len(parts2) == 1
    assert parts2[0].value == {"lat": (2, 3), "time": (0, 2)}
    # contradictory window: ONE empty-marker partition (never []:
    # PySpark substitutes [None] for an empty list and read(None) would
    # crash with AttributeError), and reading it yields zero batches
    rd3 = src.reader(src.schema())
    rd3.pushFilters([EqualTo(("lat",), 999.0)])
    parts3 = rd3.partitions()
    assert len(parts3) == 1 and parts3[0].value is None
    assert list(rd3.read(parts3[0])) == []


def test_auto_coarsened_partitions(spark, store):
    """Default read plan merges tiny store chunks into fewer input
    partitions (bounded task count at scale); results are unchanged and
    reads stay store-chunk-aligned."""
    p, nd = store
    src = spark_datasource.ZarrDataSource({"path": p})
    rd = src.reader(src.schema())
    assert len(rd.partitions()) == 1  # 960-byte store -> one partition
    fine = spark_datasource.ZarrDataSource({"path": p, "target_partition_bytes": "0"})
    assert len(fine.reader(fine.schema()).partitions()) == 4
    spark_datasource.register(spark)
    df = spark.read.format("xbs_zarr").option("path", p).load()
    assert df.count() == 120  # values identical either way (checked above)


def test_pushdown_is_best_effort_only(spark, store):
    """Every filter is re-evaluated by Spark post-scan: a filter the
    reader cannot translate must not change results."""
    p, nd = store
    spark_datasource.register(spark)
    df = spark.read.format("xbs_zarr").option("path", p).load()
    got = df.where("t2m > 0.5 AND time % 7200 = 0").count()  # t2m: not a dim
    want = int(
        ((nd.data_vars["t2m"].values[::2, :]) > 0.5).sum()
    )
    assert got == want


def test_datetime_coord_pushdown(spark, tmp_path):
    nd = NDDataset(
        {"v": (("day",), np.arange(10.0))},
        coords={"day": np.array(["2024-01-%02d" % d for d in range(1, 11)], "datetime64[us]")},
    )
    p = str(tmp_path / "dt")
    zarr_io.to_zarr(Dataset.from_numpy(spark, nd, chunks={"day": 2}), p)
    src = spark_datasource.ZarrDataSource({"path": p, "target_partition_bytes": "0"})
    rd = src.reader(src.schema())
    rd.pushFilters([GreaterThanOrEqual(("day",), datetime.datetime(2024, 1, 8))])
    assert sorted(pt.value["day"] for pt in rd.partitions()) == [(7, 8), (8, 10)]
    spark_datasource.register(spark)
    df = spark.read.format("xbs_zarr").option("path", p).load()
    got = df.where(F.col("day") >= "2024-01-08").agg(F.sum("v")).collect()[0][0]
    assert got == 7.0 + 8.0 + 9.0


def test_sql_write_roundtrip(spark, store, tmp_path):
    # INSERT path: copy a store's rows into a fresh (setup, empty) store
    # via df.write.format("xbs_zarr"), then read back and compare
    p, nd = store
    spark_datasource.register(spark)
    dst = str(tmp_path / "dst")
    # create destination with identical metadata but no data chunks
    zarr_io.setup_zarr(
        Dataset.from_numpy(spark, nd, chunks={"time": 6}).template,
        dst,
        {"time": 6, "lat": 5},
    )
    src_df = spark.read.format("xbs_zarr").option("path", p).load()
    # co-locate whole chunks per task: time is the only chunked dim
    (
        src_df.repartition(4, F.floor(F.col("time") / (6 * 3600)))
        .write.format("xbs_zarr")
        .option("path", dst)
        .mode("append")
        .save()
    )
    back = spark.read.format("xbs_zarr").option("path", dst).load()
    a = src_df.orderBy("time", "lat").collect()
    b = back.orderBy("time", "lat").collect()
    assert a == b


def test_sql_write_rejects_cross_task_chunk_split(spark, store, tmp_path):
    """Adversarial partitioning — cells of one store chunk scattered
    across tasks — must FAIL the job (commit-time ownership check), not
    silently drop the cells that lost the atomic-rename race."""
    p, nd = store
    spark_datasource.register(spark)
    dst = str(tmp_path / "dst_adv")
    zarr_io.setup_zarr(
        Dataset.from_numpy(spark, nd, chunks={"time": 6}).template,
        dst,
        {"time": 6, "lat": 5},
    )
    src_df = spark.read.format("xbs_zarr").option("path", p).load()
    # round-robin over 8 tasks: every time-chunk is split across tasks
    with pytest.raises(Exception, match="more than one task"):
        (
            src_df.repartition(8)
            .write.format("xbs_zarr")
            .option("path", dst)
            .mode("append")
            .save()
        )


def test_repartition_for_write_satisfies_contract(spark, store, tmp_path):
    """The one-call helper makes an arbitrarily-partitioned DataFrame
    writable: chunk-key hash shuffle → disjoint ownership → lossless
    round-trip."""
    p, nd = store
    spark_datasource.register(spark)
    dst = str(tmp_path / "dst_rep")
    zarr_io.setup_zarr(
        Dataset.from_numpy(spark, nd, chunks={"time": 6}).template,
        dst,
        {"time": 6, "lat": 5},
    )
    src_df = spark.read.format("xbs_zarr").option("path", p).load()
    scattered = src_df.repartition(8)  # would fail the ownership check
    (
        spark_datasource.repartition_for_write(scattered, dst)
        .write.format("xbs_zarr")
        .option("path", dst)
        .mode("append")
        .save()
    )
    back = spark.read.format("xbs_zarr").option("path", dst).load()
    assert (
        back.orderBy("time", "lat").collect()
        == src_df.orderBy("time", "lat").collect()
    )


def test_sql_write_rejects_unknown_column(spark, store, tmp_path):
    p, nd = store
    spark_datasource.register(spark)
    dst = str(tmp_path / "dst2")
    zarr_io.setup_zarr(
        Dataset.from_numpy(spark, nd, chunks={"time": 6}).template,
        dst,
        {"time": 6, "lat": 5},
    )
    df = (
        spark.read.format("xbs_zarr").option("path", p).load()
        .withColumn("bogus", F.lit(1))
    )
    with pytest.raises(Exception, match="unknown columns"):
        df.write.format("xbs_zarr").option("path", dst).mode("append").save()


def test_sql_write_rejects_off_axis_values(spark, store, tmp_path):
    p, nd = store
    spark_datasource.register(spark)
    dst = str(tmp_path / "dst3")
    zarr_io.setup_zarr(
        Dataset.from_numpy(spark, nd, chunks={"time": 6}).template,
        dst,
        {"time": 6, "lat": 5},
    )
    df = (
        spark.read.format("xbs_zarr").option("path", p).load()
        .withColumn("time", F.col("time") + F.lit(1))  # off the axis
    )
    with pytest.raises(Exception, match="coordinate axis"):
        df.write.format("xbs_zarr").option("path", dst).mode("append").save()


def test_vars_option_prunes_columns(spark, store):
    p, nd = store
    spark_datasource.register(spark)
    df = (
        spark.read.format("xbs_zarr")
        .option("path", p)
        .option("vars", "t2m")
        .load()
    )
    assert [f.name for f in df.schema.fields] == ["lat", "time", "t2m"]
    rows = df.orderBy("time", "lat").collect()
    assert len(rows) == 120
    assert rows[52]["t2m"] == nd.data_vars["t2m"].values[10, 2]
    with pytest.raises(Exception, match="unknown vars"):
        spark.read.format("xbs_zarr").option("path", p).option("vars", "nope").load().count()


class TestStreamingRead:
    def _setup_store(self, spark, tmp_path, nt=12):
        rng = np.random.default_rng(7)
        nd = NDDataset(
            {"v": (("time", "x"), rng.normal(size=(nt, 3)))},
            coords={
                "time": np.arange(nt, dtype=np.int64),
                "x": np.arange(3, dtype=np.int64),
            },
        )
        p = str(tmp_path / "stream_store")
        full = Dataset.from_numpy(spark, nd, chunks={"time": 4})
        zarr_io.setup_zarr(full.template, p, {"time": 4, "x": 3})
        return p, nd

    def _append(self, spark, nd, path, lo, hi):
        part = Dataset.from_numpy(
            spark, nd.isel({"time": slice(lo, hi)}), chunks={"time": 4}
        )
        zarr_io.to_zarr(part, path, needs_setup=False, origin={"time": lo})

    def test_tail_growing_store(self, spark, tmp_path):
        p, nd = self._setup_store(spark, tmp_path)
        spark_datasource.register(spark)
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")

        def drain():
            q = (
                spark.readStream.format("xbs_zarr")
                .option("path", p)
                .option("stream_dim", "time")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120), "stream did not finish in 120s"
            return spark.read.schema("time long, x long, v double").parquet(out)

        # two complete slabs available (times 0-7)
        self._append(spark, nd, p, 0, 8)
        got = drain()
        assert got.count() == 8 * 3
        assert got.agg(F.max("time")).first()[0] == 7

        # one more slab lands; a resumed stream reads ONLY the new slab
        self._append(spark, nd, p, 8, 12)
        got = drain()
        assert got.count() == 12 * 3
        vals = {
            (r["time"], r["x"]): r["v"] for r in got.collect()
        }
        for i in range(12):
            for j in range(3):
                assert vals[(i, j)] == pytest.approx(nd.data_vars["v"].values[i, j])

    def test_incomplete_slab_not_emitted(self, spark, tmp_path):
        p, nd = self._setup_store(spark, tmp_path)
        from xarray_beam_spark.sources.spark_datasource import ZarrStreamReader
        from xarray_beam_spark.sources import zarr_io as zio

        self._append(spark, nd, p, 0, 4)
        template, chunks, arrays = zio.open_zarr_meta(p)
        r = ZarrStreamReader(p, template, chunks, sorted(template.sizes), ["v"], arrays, "time")
        assert r.latestOffset() == {"slab": 1}
        # slab 1 (times 4-7) absent; slab 2 written out of order doesn't
        # advance the contiguous frontier past the gap
        self._append(spark, nd, p, 8, 12)
        assert r.latestOffset() == {"slab": 1}
        self._append(spark, nd, p, 4, 8)
        assert r.latestOffset() == {"slab": 3}

    def test_stream_requires_stream_dim(self, spark, tmp_path):
        p, nd = self._setup_store(spark, tmp_path)
        spark_datasource.register(spark)
        q = (
            spark.readStream.format("xbs_zarr").option("path", p).load()
            .writeStream.format("noop").trigger(availableNow=True).start()
        )
        with pytest.raises(Exception, match="stream_dim"):
            q.awaitTermination(60)


class TestStreamingWrite:
    def test_stream_copy_store_to_store(self, spark, tmp_path):
        """readStream xbs_zarr → writeStream xbs_zarr: a streaming
        grid-to-grid copy. Source partitions are whole chunks and the
        destination shares the chunk grid, so every task owns whole
        destination chunks (the writer's safety contract) without any
        explicit repartition."""
        rng = np.random.default_rng(11)
        nd = NDDataset(
            {"v": (("time", "x"), rng.normal(size=(8, 3)))},
            coords={
                "time": np.arange(8, dtype=np.int64),
                "x": np.arange(3, dtype=np.int64),
            },
        )
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        full = Dataset.from_numpy(spark, nd, chunks={"time": 4})
        zarr_io.to_zarr(full, src, zarr_chunks={"time": 4, "x": 3})
        zarr_io.setup_zarr(full.template, dst, {"time": 4, "x": 3})
        spark_datasource.register(spark)
        q = (
            spark.readStream.format("xbs_zarr")
            .option("path", src)
            .option("stream_dim", "time")
            .load()
            .writeStream.format("xbs_zarr")
            .option("path", dst)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in 120s"
        back = zarr_io.from_zarr(spark, dst).collect()
        np.testing.assert_allclose(back.data_vars["v"].values, nd.data_vars["v"].values)


def test_sql_write_honors_store_fill_value(spark, tmp_path):
    """Uncovered cells of a partially-covered chunk take the store's
    (per-variable) fill_value, consistent with never-written chunks."""
    from xarray_beam_spark.dataset import Template
    from xarray_beam_spark.ndarray_ds import Variable
    from xarray_beam_spark.sources import zarrlite

    tmpl = Template(
        sizes={"x": 4},
        var_meta={"v": (("x",), "<f8")},
        coords={"x": Variable(("x",), np.arange(4, dtype=np.int64))},
        attrs={},
    )
    dst = str(tmp_path / "fillstore")
    zarr_io.setup_zarr(tmpl, dst, {"x": 4}, encoding={"v": {"fill_value": -9999.0}})
    spark_datasource.register(spark)
    df = spark.createDataFrame([(0, 1.5), (2, 2.5)], "x long, v double")
    df.coalesce(1).write.format("xbs_zarr").option("path", dst).mode("append").save()
    got = zarrlite.read_full(zarrlite.open_array(dst, "v"))
    np.testing.assert_array_equal(got, [1.5, -9999.0, 2.5, -9999.0])


class TestJvmChunkKey:
    """repartition_for_write's whole-stage-codegen key path."""

    def _mk(self, spark, tmp_path, time_vals):
        rng = np.random.default_rng(1)
        nd = NDDataset(
            {"v": (("time", "cat"), rng.normal(size=(len(time_vals), 3)))},
            coords={"time": time_vals, "cat": np.array(["a", "b", "c"])},
        )
        p = str(tmp_path / "jvmsrc")
        zarr_io.to_zarr(Dataset.from_numpy(spark, nd, chunks={"time": 4}), p)
        dst = str(tmp_path / "jvmdst")
        zarr_io.setup_zarr(
            Dataset.from_numpy(spark, nd, chunks={"time": 4}).template,
            dst, {"time": 4, "cat": 3},
        )
        return p, dst, nd

    def test_regular_axes_stay_jvm_side(self, spark, tmp_path):
        """Regular timestamp + small categorical axes → the shuffle key is
        a JVM expression: no Python eval node anywhere in the plan."""
        times = (np.datetime64("2024-01-01", "h") + np.arange(16)).astype("datetime64[us]")
        p, dst, nd = self._mk(spark, tmp_path, times)
        spark_datasource.register(spark)
        df = spark.read.format("xbs_zarr").option("path", p).load()
        rp = spark_datasource.repartition_for_write(df.repartition(8), dst)
        plan = rp._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        rp.write.format("xbs_zarr").option("path", dst).mode("append").save()
        back = spark.read.format("xbs_zarr").option("path", dst).load()
        assert back.orderBy("time", "cat").collect() == df.orderBy("time", "cat").collect()

    def test_integer_axis_jvm(self, spark, tmp_path):
        p, dst, nd = self._mk(spark, tmp_path, np.arange(16, dtype=np.int64) * 10)
        spark_datasource.register(spark)
        df = spark.read.format("xbs_zarr").option("path", p).load()
        rp = spark_datasource.repartition_for_write(df.repartition(8), dst)
        plan = rp._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        rp.write.format("xbs_zarr").option("path", dst).mode("append").save()
        back = spark.read.format("xbs_zarr").option("path", dst).load()
        assert back.orderBy("time", "cat").collect() == df.orderBy("time", "cat").collect()

    def test_irregular_axis_falls_back_to_udf(self, spark, tmp_path):
        """Irregular spacing → the key must come from the validating UDF
        path (searchsorted), and the contract still holds."""
        irregular = np.array([0, 1, 3, 7, 8, 9, 20, 21, 22, 40, 41, 42, 60, 61, 62, 63], dtype=np.int64)
        p, dst, nd = self._mk(spark, tmp_path, irregular)
        spark_datasource.register(spark)
        df = spark.read.format("xbs_zarr").option("path", p).load()
        rp = spark_datasource.repartition_for_write(df.repartition(8), dst)
        plan = rp._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
        rp.write.format("xbs_zarr").option("path", dst).mode("append").save()
        back = spark.read.format("xbs_zarr").option("path", dst).load()
        assert back.orderBy("time", "cat").collect() == df.orderBy("time", "cat").collect()

    def test_jvm_index_matches_writer_index(self, spark, tmp_path):
        """_jvm_dim_index must agree element-for-element with the writer's
        _dim_index on every expressible axis shape."""
        from xarray_beam_spark.sources.spark_datasource import _dim_index, _jvm_dim_index

        times = (np.datetime64("2024-06-01", "m") + np.arange(12) * 15).astype("datetime64[us]")
        ints = np.arange(12, dtype=np.int64) * 7 + 3
        cats = np.array([f"k{i:02d}" for i in range(12)])  # sorted, like _dim_index assumes
        rows = [
            (times[i].item(), int(ints[i]), str(cats[i]), i)
            for i in range(12)
        ]
        df = spark.createDataFrame(
            rows, "t timestamp_ntz, n long, c string, expect int"
        )
        for col, axis in [("t", times), ("n", ints), ("c", cats)]:
            expr = _jvm_dim_index(col, axis, df)
            assert expr is not None, col
            got = [r[0] for r in df.select(expr).collect()]
            want = _dim_index(col, axis, 12, axis)
            assert got == list(want), col


class TestRound12Regressions:
    def test_fully_pruned_sql_query_returns_zero_rows(self, spark, store):
        """A filter that prunes every partition must yield an empty
        result, not crash in read(None)."""
        p, _ = store
        spark_datasource.register(spark)
        df = spark.read.format("xbs_zarr").option("path", p).load()
        assert df.where(F.col("lat") == 999.0).count() == 0

    def test_sql_write_to_sharded_store(self, spark, store, tmp_path):
        """v3 sharded destination: the writer must buffer/flush/own at
        the SHARD (write unit), not the inner chunk — previously every
        task died on validate_region_alignment."""
        p, nd = store
        spark_datasource.register(spark)
        dst = str(tmp_path / "dst_sharded")
        zarr_io.setup_zarr(
            Dataset.from_numpy(spark, nd, chunks={"time": 12}).template,
            dst,
            {"time": 6, "lat": 5},  # inner chunks
            zarr_format=3,
            zarr_shards={"time": 12, "lat": 5},  # write unit = 2 chunks/dim
        )
        src_df = spark.read.format("xbs_zarr").option("path", p).load()
        out = spark_datasource.repartition_for_write(src_df, dst)
        out.write.format("xbs_zarr").option("path", dst).mode("append").save()
        back = spark.read.format("xbs_zarr").option("path", dst).load()
        a = src_df.orderBy("time", "lat").collect()
        b = back.orderBy("time", "lat").collect()
        assert a == b

    def test_descending_axis_write(self, spark, tmp_path):
        """ERA5-style descending latitude: the writer's index math must
        map values on a descending axis instead of rejecting them."""
        nd = NDDataset(
            {"v": (("lat",), np.arange(4, dtype=np.float64))},
            coords={"lat": np.array([60.0, 30.0, 0.0, -30.0])},
        )
        p = str(tmp_path / "desc")
        zarr_io.to_zarr(Dataset.from_numpy(spark, nd, chunks={"lat": 2}), p)
        spark_datasource.register(spark)
        dst = str(tmp_path / "desc_dst")
        zarr_io.setup_zarr(
            Dataset.from_numpy(spark, nd, chunks={"lat": 2}).template,
            dst,
            {"lat": 2},
        )
        src_df = spark.read.format("xbs_zarr").option("path", p).load()
        out = spark_datasource.repartition_for_write(src_df, dst)
        out.write.format("xbs_zarr").option("path", dst).mode("append").save()
        back = spark.read.format("xbs_zarr").option("path", dst).load()
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src_df.collect())
        )

    def test_salted_join_outer_refused(self, spark):
        from xarray_beam_spark.skew import salted_join

        big = spark.createDataFrame([(1, "x")], "k long, a string")
        small = spark.createDataFrame([(2, "y")], "k long, b string")
        with pytest.raises(ValueError, match="salted_join cannot express"):
            salted_join(big, small, on=["k"], how="full")
        # the allowed types still work
        assert salted_join(big, small, on=["k"], how="left").count() == 1


def test_huge_dim_fractional_literal_pruning_is_exact(spark, store):
    """The >2^22 coordinate-less branch must round fractional literals
    TOWARD keeping indices: int() truncation on LessThan(3.5) would
    prune away index 3 (which satisfies d < 3.5), and a pruning loss
    cannot be restored by Spark's post-scan re-filter."""
    from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

    p, _ = store
    src = spark_datasource.ZarrDataSource({"path": p})

    def huge_reader():
        rd = src.reader(src.schema())
        n = 1 << 23  # force the coordinate-less window-arithmetic branch
        rd.sizes["time"] = n
        rd.coords.pop("time", None)
        rd.window["time"] = (0, n)
        return rd, n

    rd, n = huge_reader()
    rd.pushFilters([LessThan(("time",), 3.5)])
    assert rd.window["time"] == (0, 4)  # indices 0..3 all satisfy < 3.5

    rd, n = huge_reader()
    rd.pushFilters([GreaterThan(("time",), 3.5)])
    assert rd.window["time"] == (4, n)

    rd, n = huge_reader()
    rd.pushFilters([GreaterThanOrEqual(("time",), 3.5)])
    assert rd.window["time"] == (4, n)

    rd, n = huge_reader()
    rd.pushFilters([LessThanOrEqual(("time",), 3.5)])
    assert rd.window["time"] == (0, 4)

    # integer literals keep their exact windows
    rd, n = huge_reader()
    rd.pushFilters([LessThan(("time",), 3), GreaterThanOrEqual(("time",), 1)])
    assert rd.window["time"] == (1, 3)

    # fractional equality matches no index: window untouched (post-scan
    # filter yields empty); non-numeric / non-finite literals never prune
    import math

    rd, n = huge_reader()
    rd.pushFilters([EqualTo(("time",), 2.5)])
    assert rd.window["time"] == (0, n)
    rd.pushFilters([LessThan(("time",), math.inf)])
    assert rd.window["time"] == (0, n)
    rd.pushFilters([EqualTo(("time",), True)])
    assert rd.window["time"] == (0, n)
    rd.pushFilters([EqualTo(("time",), 7.0)])
    assert rd.window["time"] == (7, 8)
