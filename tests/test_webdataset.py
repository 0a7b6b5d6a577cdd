"""WebDataset tar-shard source/sink tests.

The format is plain POSIX tar + the ``{key}.{ext}`` naming convention,
so interop is tested against stdlib ``tarfile`` in BOTH directions:
our shards list cleanly with ``tarfile``, and a tar built with raw
``tarfile`` (a "foreign" shard) reads back through the Spark reader.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pytest

from xarray_beam_spark.sources import webdataset as wds


class TestMemberNames:
    def test_split(self):
        assert wds.split_member_name("a/b/c.seg.png") == ("a/b/c", "seg.png")
        assert wds.split_member_name("x.txt") == ("x", "txt")
        assert wds.split_member_name("d.ir/x.txt") == ("d.ir/x", "txt")

    def test_no_extension_is_loud(self):
        with pytest.raises(ValueError, match="no extension"):
            wds.split_member_name("plain")


@pytest.mark.usefixtures("spark")
class TestSparkRoundtrip:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                ("a/000", "hello", b"\x89PNG", {"lang": "en", "n": 3}, [1, 2]),
                ("a/001", None, b"zz", {"lang": "de", "n": 1}, []),
                ("b/002", "wörld", None, None, None),
            ],
            "__key__ string, txt string, png binary, "
            "meta struct<lang:string,n:long>, arr array<long>",
        )

    def test_roundtrip(self, spark, tmp_path):
        stats = wds.write_webdataset(
            self._df(spark).repartition(2, "__key__"), str(tmp_path)
        )
        assert stats["samples"] == 3
        rows = {
            r["__key__"]: r
            for r in wds.read_webdataset(spark, str(tmp_path)).collect()
        }
        assert rows["a/000"]["txt"] == "hello"
        assert bytes(rows["a/000"]["png"]) == b"\x89PNG"
        assert rows["a/000"]["meta"]["lang"] == "en"
        assert rows["a/000"]["arr"] == [1, 2]
        assert rows["a/001"]["txt"] is None and rows["a/001"]["arr"] == []
        assert rows["b/002"]["png"] is None and rows["b/002"]["meta"] is None

    def test_deterministic_bytes(self, spark, tmp_path):
        df = self._df(spark).repartition(1).sortWithinPartitions("__key__")
        wds.write_webdataset(df, str(tmp_path / "a"))
        wds.write_webdataset(df, str(tmp_path / "b"))
        compared = 0
        for n in os.listdir(tmp_path / "a"):
            if n.endswith(".tar"):
                assert (tmp_path / "a" / n).read_bytes() == (
                    tmp_path / "b" / n
                ).read_bytes()
                compared += 1
        assert compared > 0, os.listdir(tmp_path / "a")

    def test_shard_splitting(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.range(50).select(
            F.format_string("%06d", "id").alias("__key__"),
            F.col("id").cast("string").alias("txt"),
        )
        wds.write_webdataset(df.repartition(1), str(tmp_path), shard_records=16)
        shards = [n for n in os.listdir(tmp_path) if n.endswith(".tar")]
        assert len(shards) == 4  # 3 full + remainder of 2
        back = wds.read_webdataset(spark, str(tmp_path))
        assert back.count() == 50

    def test_stdlib_tar_lists_our_shards(self, spark, tmp_path):
        wds.write_webdataset(
            self._df(spark).repartition(1).sortWithinPartitions("__key__"),
            str(tmp_path),
        )
        shard = next(n for n in sorted(os.listdir(tmp_path)) if n.endswith(".tar"))
        with tarfile.open(tmp_path / shard) as tar:
            names = [m.name for m in tar]
        # members of a sample are consecutive and extension-sorted
        assert names[:4] == ["a/000.arr", "a/000.meta", "a/000.png", "a/000.txt"]
        with tarfile.open(tmp_path / shard) as tar:
            meta = json.loads(tar.extractfile("a/000.meta").read())
        assert meta == {"lang": "en", "n": 3}  # canonical JSON, sorted keys

    def test_foreign_tar_reads_back(self, spark, tmp_path):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for name, data in [
                ("s1.txt", b"one"),
                ("s1.cls", b"7"),
                ("s2.txt", b"two"),
            ]:
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tar.addfile(ti, io.BytesIO(data))
        (tmp_path / "part-0.tar").write_bytes(buf.getvalue())
        got = wds.read_webdataset(
            spark, str(tmp_path), "__key__ string, txt string, cls long"
        )
        rows = {r["__key__"]: r for r in got.collect()}
        assert rows["s1"]["txt"] == "one" and rows["s1"]["cls"] == 7
        assert rows["s2"]["cls"] is None

    def test_ext_map(self, spark, tmp_path):
        # b/002's meta is NULL → with meta as the only member column the
        # sample would be memberless, which the writer (correctly) refuses
        df = self._df(spark).select("__key__", "meta").where("meta IS NOT NULL")
        wds.write_webdataset(df, str(tmp_path), ext_map={"meta": "json"})
        shard = next(n for n in sorted(os.listdir(tmp_path)) if n.endswith(".tar"))
        with tarfile.open(tmp_path / shard) as tar:
            assert all(m.name.endswith(".json") for m in tar)
        back = wds.read_webdataset(spark, str(tmp_path))
        assert back.columns == ["__key__", "meta"]

    def test_dotted_key_is_loud(self, spark, tmp_path):
        df = spark.createDataFrame([("a.b", "x")], "__key__ string, txt string")
        with pytest.raises(Exception, match="contains '\\.'"):
            wds.write_webdataset(df, str(tmp_path))

    def test_null_key_is_loud(self, spark, tmp_path):
        df = spark.createDataFrame([(None, "x")], "__key__ string, txt string")
        with pytest.raises(Exception, match="NULL sample key"):
            wds.write_webdataset(df, str(tmp_path))

    def test_ext_collision_is_loud(self, spark, tmp_path):
        df = self._df(spark)
        with pytest.raises(ValueError, match="collision"):
            wds.write_webdataset(df, str(tmp_path), ext_map={"txt": "png"})

    def test_nonconsecutive_key_is_loud(self, spark, tmp_path):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for name in ["k1.txt", "k2.txt", "k1.cls"]:
                ti = tarfile.TarInfo(name)
                ti.size = 1
                tar.addfile(ti, io.BytesIO(b"x"))
        (tmp_path / "part-0.tar").write_bytes(buf.getvalue())
        df = wds.read_webdataset(spark, str(tmp_path), "__key__ string, txt string")
        with pytest.raises(Exception, match="not\\s+consecutive"):
            df.collect()

    def test_duplicate_member_is_loud(self, spark, tmp_path):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for name in ["k1.txt", "k1.txt"]:
                ti = tarfile.TarInfo(name)
                ti.size = 1
                tar.addfile(ti, io.BytesIO(b"x"))
        (tmp_path / "part-0.tar").write_bytes(buf.getvalue())
        df = wds.read_webdataset(spark, str(tmp_path), "__key__ string, txt string")
        with pytest.raises(Exception, match="duplicate member"):
            df.collect()

    def test_missing_sidecar_is_loud(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            wds.read_webdataset(spark, str(tmp_path))

    def test_unmapped_extension_ignored(self, spark, tmp_path):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for name, data in [("s1.txt", b"one"), ("s1.extra", b"?")]:
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tar.addfile(ti, io.BytesIO(data))
        (tmp_path / "part-0.tar").write_bytes(buf.getvalue())
        got = wds.read_webdataset(spark, str(tmp_path), "__key__ string, txt string")
        assert got.collect()[0]["txt"] == "one"


@pytest.mark.usefixtures("spark")
class TestExactness:
    """Arrow data path: JSON members must be strict JSON with exact ints."""

    def test_null_bearing_long_column(self, spark, tmp_path):
        big = (1 << 62) + 1
        df = spark.createDataFrame(
            [("k1", big, "x"), ("k2", None, "y")], "__key__ string, n long, txt string"
        )
        wds.write_webdataset(df.repartition(1), str(tmp_path))
        shard = next(n for n in sorted(os.listdir(tmp_path)) if n.endswith(".tar"))
        with tarfile.open(tmp_path / shard) as tar:
            names = {m.name for m in tar}
            # NULL cell → NO member (never a literal NaN), int stays int
            assert "k2.n" not in names and "k2.txt" in names
            assert tar.extractfile("k1.n").read() == str(big).encode()
        rows = {r["__key__"]: r for r in wds.read_webdataset(spark, str(tmp_path)).collect()}
        assert rows["k1"]["n"] == big and rows["k2"]["n"] is None

    def test_all_null_sample_is_loud(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("a", "x"), ("b", None)], "__key__ string, txt string"
        )
        with pytest.raises(Exception, match="every member column NULL"):
            wds.write_webdataset(df.repartition(1), str(tmp_path))


class TestProperties:
    def test_random_samples_roundtrip(self, spark, tmp_path):
        """Deterministic pseudo-random corpus: keys, NULL patterns, and
        value shapes all vary; write → read must be the identity on the
        non-NULL cells and NULL-preserving elsewhere."""
        import random

        rng = random.Random(42)
        rows = []
        for i in range(60):
            txt = None if rng.random() < 0.2 else "".join(
                rng.choice("abœ€ xyz\n") for _ in range(rng.randint(0, 40))
            )
            blob = None if rng.random() < 0.2 else bytes(
                rng.getrandbits(8) for _ in range(rng.randint(0, 64))
            )
            n = None if rng.random() < 0.2 else rng.randint(-(2**62), 2**62)
            if txt is None and blob is None and n is None:
                txt = "fallback"  # all-NULL samples are (correctly) refused
            rows.append((f"s/{i:04d}", txt, blob, n))
        df = spark.createDataFrame(
            rows, "__key__ string, txt string, blob binary, n long"
        )
        wds.write_webdataset(df.repartition(3, "__key__"), str(tmp_path))
        got = {
            r["__key__"]: r
            for r in wds.read_webdataset(spark, str(tmp_path)).collect()
        }
        assert len(got) == 60
        for k, txt, blob, n in rows:
            r = got[k]
            assert r["txt"] == txt
            assert (bytes(r["blob"]) if r["blob"] is not None else None) == blob
            assert r["n"] == n


@pytest.mark.usefixtures("spark")
class TestStreamingSink:
    def test_foreachbatch_appends_and_skips_replays(self, spark, tmp_path):
        sink = wds.webdataset_stream_sink(str(tmp_path))
        b0 = spark.createDataFrame([("k0", "a"), ("k1", "b")], "__key__ string, txt string")
        b1 = spark.createDataFrame([("k2", "c")], "__key__ string, txt string")
        sink(b0, 0)
        sink(b1, 1)
        sink(b0, 0)  # replayed batch id: no-op
        got = {r["__key__"]: r["txt"] for r in wds.read_webdataset(spark, str(tmp_path)).collect()}
        assert got == {"k0": "a", "k1": "b", "k2": "c"}
        names = sorted(n for n in os.listdir(tmp_path) if n.endswith(".tar"))
        assert all(n.startswith("batch-") for n in names)
        meta = json.loads((tmp_path / "_xbs_wds_meta.json").read_text())
        assert meta["shards"] == names

    def test_contract_drift_is_loud(self, spark, tmp_path):
        sink = wds.webdataset_stream_sink(str(tmp_path))
        sink(spark.createDataFrame([("k", "a")], "__key__ string, txt string"), 0)
        with pytest.raises(Exception, match="different schema"):
            sink(spark.createDataFrame([("k", b"a")], "__key__ string, blob binary"), 1)

    def test_real_stream_available_now(self, spark, tmp_path):
        from pyspark.sql import functions as F

        src_dir = tmp_path / "src"
        out = tmp_path / "out"
        spark.createDataFrame(
            [(i, f"doc-{i}") for i in range(30)], "id long, txt string"
        ).repartition(3).write.parquet(str(src_dir))
        src = (
            spark.readStream.schema("id long, txt string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src_dir))
            .select(
                F.format_string("%06d", "id").alias("__key__"),
                F.col("txt"),
            )
        )
        q = (
            src.writeStream.foreachBatch(wds.webdataset_stream_sink(str(out)))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        back = wds.read_webdataset(spark, str(out))
        assert sorted(r["__key__"] for r in back.collect()) == [
            f"{i:06d}" for i in range(30)
        ]


class TestManifestAndFilesOverride:
    def test_empty_dataset_roundtrips_as_zero_rows(self, spark, tmp_path):
        df = spark.createDataFrame([], "__key__ string, txt string")
        stats = wds.write_webdataset(df, str(tmp_path))
        assert stats["samples"] == 0
        back = wds.read_webdataset(spark, str(tmp_path))
        assert back.columns == ["__key__", "txt"]
        assert back.count() == 0

    def test_files_override_reads_sidecarless_dir(self, spark, tmp_path):
        import os

        wds.write_webdataset(
            _simple_df(spark).repartition(1), str(tmp_path), shard_records=1
        )
        os.remove(tmp_path / "_xbs_wds_meta.json")
        shards = sorted(n for n in os.listdir(tmp_path) if n.endswith(".tar"))
        assert len(shards) == 3
        got = wds.read_webdataset(
            spark,
            str(tmp_path),
            "__key__ string, txt string",
            files=shards[:2],
        )
        assert got.count() == 2


def _simple_df(spark):
    return spark.createDataFrame(
        [("a/000", "x"), ("a/001", "y"), ("a/002", "z")],
        "__key__ string, txt string",
    )


class TestReviewRegressions:
    """Round-12 module-review findings, pinned."""

    def test_duplicate_key_in_partition_is_loud(self, spark, tmp_path):
        """Consecutive same-key rows would merge into ONE sample on read
        (2 rows in, 1 out, flush-boundary-dependent) — refuse at write."""
        df = spark.createDataFrame(
            [("k", "a", None), ("k", None, b"x")],
            "__key__ string, txt string, bin binary",
        )
        with pytest.raises(Exception, match="duplicate sample key"):
            wds.write_webdataset(df.repartition(1), str(tmp_path))

    def test_reader_ext_collision_is_loud(self, spark, tmp_path):
        wds.write_webdataset(_simple_df(spark), str(tmp_path))
        with pytest.raises(ValueError, match="extension collision"):
            wds.read_webdataset(
                spark,
                str(tmp_path),
                "__key__ string, a string, b string",
                ext_map={"a": "x", "b": "x"},
            )

    def test_overlong_key_names_the_sample(self, spark, tmp_path):
        long_key = "k" * 140  # no '/' → USTAR cannot split the name
        df = spark.createDataFrame(
            [(long_key, "v")], "__key__ string, txt string"
        )
        with pytest.raises(Exception, match="USTAR name limit"):
            wds.write_webdataset(df, str(tmp_path))


class TestBoundedBatches:
    """Rows exceeding ``batch_bytes`` must leave the read task as
    multiple RecordBatches (tarfile stream mode + bounded flushes) and
    still round-trip exactly."""

    def test_multiple_batches_per_shard_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.range(120).select(
            F.concat(F.lit("k/"), F.col("id").cast("string")).alias("__key__"),
            F.concat(F.lit("x" * 400), F.col("id").cast("string")).alias("txt"),
        )
        wds.write_webdataset(df.repartition(1), str(tmp_path), shard_records=1000)
        back = wds.read_webdataset(spark, str(tmp_path), batch_bytes=1024)
        rows = {r["__key__"]: r["txt"] for r in back.collect()}
        assert len(rows) == 120
        assert rows["k/9"] == "x" * 400 + "9"
