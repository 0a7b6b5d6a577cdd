"""TFRecord container + tf.train.Example codec tests.

Both layers are from-spec (no TensorFlow in the container), so the
golden values here come from the PUBLIC specs themselves: the crc32c
check vector from RFC 3720 §B.4, the masked-crc framing formula from
tensorflow core/lib/io/record_writer.cc, and proto wire bytes derived
by hand from example.proto/feature.proto.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_beam_spark.sources import tfrecord as tfr
from xarray_beam_spark.sources.zarrlite import _crc32c


class TestFraming:
    def test_crc32c_check_vector(self):
        # RFC 3720 §B.4: crc32c("123456789") == 0xE3069283
        assert _crc32c(b"123456789") == 0xE3069283

    def test_batch_crc_matches_scalar(self):
        rng = np.random.default_rng(7)
        bufs = [
            bytes(rng.integers(0, 256, int(n), dtype=np.uint8).tobytes())
            for n in rng.integers(0, 64, 50)
        ] + [b"", b"123456789"]
        got = tfr._crc32c_batch(bufs)
        assert [int(x) for x in got] == [_crc32c(b) for b in bufs]

    def test_mask_formula(self):
        # record_writer.cc: mask = ((crc >> 15) | (crc << 17)) + 0xa282ead8
        crc = _crc32c(b"data")
        expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert tfr._masked_crc(b"data") == expect
        got = tfr._mask_batch(np.asarray([crc], np.uint32))
        assert int(got[0]) == expect

    def test_roundtrip(self):
        recs = [b"", b"a", b"hello world" * 10]
        assert list(tfr.iter_records(tfr.frame_records(recs))) == recs

    def test_frame_layout(self):
        framed = tfr.frame_records([b"abc"])
        assert struct.unpack_from("<Q", framed, 0)[0] == 3
        assert framed[12:15] == b"abc"
        assert len(framed) == 8 + 4 + 3 + 4

    @pytest.mark.parametrize("byte_off", [0, 9, 13, 16])
    def test_corruption_is_loud(self, byte_off):
        framed = bytearray(tfr.frame_records([b"abcd"]))
        framed[byte_off] ^= 0x01
        with pytest.raises(ValueError, match="crc mismatch|truncated"):
            list(tfr.iter_records(bytes(framed)))

    def test_truncation_is_loud(self):
        framed = tfr.frame_records([b"abcd"])
        for cut in (4, 13, len(framed) - 1):
            with pytest.raises(ValueError, match="truncated"):
                list(tfr.iter_records(framed[:cut]))


class TestExampleProto:
    def test_golden_bytes(self):
        # Hand-derived from example.proto/feature.proto:
        # Example{features=1}{ entry{ key="a", value=Feature{int64_list
        # =3}{ value=1 packed [1] } } }
        assert tfr.encode_example({"a": ("int64", [1])}) == bytes.fromhex(
            "0a0c0a0a0a01611205" "1a030a0101"
        )

    def test_all_kinds_roundtrip(self):
        feats = {
            "s": ("bytes", [b"hi", b"", "caf\xe9".encode()]),
            "i": ("int64", [0, -1, 2**62, -(2**62)]),
            "f": ("float", [0.0, 1.5, -2.25]),
        }
        assert tfr.decode_example(tfr.encode_example(feats)) == feats

    def test_deterministic_key_order(self):
        a = tfr.encode_example({"b": ("int64", [1]), "a": ("int64", [2])})
        b = tfr.encode_example({"a": ("int64", [2]), "b": ("int64", [1])})
        assert a == b

    def test_unpacked_int64_accepted(self):
        # writers MAY emit repeated int64 unpacked (wire type 0 per value)
        inner = b"".join(tfr._varint(8) + tfr._varint(v % (1 << 64)) for v in (5, -3))
        feature = tfr._ld(3, inner)
        entry = tfr._ld(1, b"x") + tfr._ld(2, feature)
        msg = tfr._ld(1, tfr._ld(1, entry))
        assert tfr.decode_example(msg) == {"x": ("int64", [5, -3])}

    def test_unpacked_float_accepted(self):
        inner = b"".join(
            tfr._varint((1 << 3) | 5) + np.float32(v).tobytes() for v in (1.5, -2.0)
        )
        feature = tfr._ld(2, inner)
        entry = tfr._ld(1, b"x") + tfr._ld(2, feature)
        msg = tfr._ld(1, tfr._ld(1, entry))
        assert tfr.decode_example(msg) == {"x": ("float", [1.5, -2.0])}

    def test_unknown_fields_skipped(self):
        base = tfr.encode_example({"a": ("int64", [1])})
        # append an unknown varint field (field 9) at the Example level
        extended = base + tfr._varint(9 << 3) + tfr._varint(42)
        assert tfr.decode_example(extended) == {"a": ("int64", [1])}

    @given(
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.one_of(
                st.tuples(
                    st.just("int64"),
                    st.lists(st.integers(-(2**63), 2**63 - 1), max_size=5),
                ),
                st.tuples(st.just("bytes"), st.lists(st.binary(max_size=16), max_size=5)),
            ),
            max_size=5,
        )
    )
    @settings(max_examples=50, deadline=None)
    def test_property_roundtrip(self, feats):
        assert tfr.decode_example(tfr.encode_example(feats)) == feats


def _mixed_types_df(spark):
    return spark.createDataFrame(
        [
            (1, "hello", [1, 2], 1.5, b"\x00\xff", True),
            (2, None, [], None, None, False),
            (3, "wörld", [7], 2.25, b"z", None),
        ],
        "id long, txt string, arr array<long>, f float, blob binary, flag boolean",
    )


@pytest.mark.usefixtures("spark")
class TestSparkRoundtrip:
    def _df(self, spark):
        return _mixed_types_df(spark)

    def test_roundtrip_all_types(self, spark, tmp_path):
        df = self._df(spark)
        stats = tfr.write_tfrecords(df.repartition(2, "id"), str(tmp_path))
        assert stats["records"] == 3 and stats["shards"] >= 1
        rows = {r["id"]: r for r in tfr.read_tfrecords(spark, str(tmp_path)).collect()}
        assert rows[1]["txt"] == "hello" and rows[1]["arr"] == [1, 2]
        assert bytes(rows[1]["blob"]) == b"\x00\xff" and rows[1]["flag"] is True
        assert rows[2]["txt"] is None and rows[2]["arr"] == []
        assert rows[2]["f"] is None and rows[2]["flag"] is False
        assert rows[3]["f"] == 2.25 and rows[3]["flag"] is None

    def test_sharding(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.range(100).select(F.col("id"))
        tfr.write_tfrecords(df.repartition(1), str(tmp_path), shard_records=16)
        import os

        shards = sorted(p for p in os.listdir(tmp_path) if p.endswith(".tfrecord"))
        assert len(shards) == 7  # 6 full shards of 16 + remainder of 4
        back = tfr.read_tfrecords(spark, str(tmp_path))
        assert sorted(r["id"] for r in back.collect()) == list(range(100))

    def test_double_refused_unless_opted_in(self, spark, tmp_path):
        df = spark.createDataFrame([(1.5,)], "d double")
        with pytest.raises(TypeError, match="float32"):
            tfr.write_tfrecords(df, str(tmp_path))
        tfr.write_tfrecords(df, str(tmp_path / "ok"), allow_f32_demotion=True)
        got = tfr.read_tfrecords(
            spark, str(tmp_path / "ok"), "d float"
        ).collect()
        assert got[0]["d"] == 1.5

    def test_unsupported_type_is_loud(self, spark, tmp_path):
        df = spark.createDataFrame([({"k": 1},)], "m map<string,long>")
        with pytest.raises(TypeError, match="no\\s+tf.train.Feature mapping"):
            tfr.write_tfrecords(df, str(tmp_path))

    def test_explicit_ddl_schema_subset(self, spark, tmp_path):
        tfr.write_tfrecords(self._df(spark), str(tmp_path))
        got = tfr.read_tfrecords(spark, str(tmp_path), "id long, txt string")
        assert set(got.columns) == {"id", "txt"}
        assert {r["id"] for r in got.collect()} == {1, 2, 3}

    def test_missing_sidecar_is_loud(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            tfr.read_tfrecords(spark, str(tmp_path))

    def test_deterministic_bytes(self, spark, tmp_path):
        """Equal rows → identical shard bytes (idempotent task retries)."""
        df = self._df(spark).repartition(1).sortWithinPartitions("id")
        tfr.write_tfrecords(df, str(tmp_path / "a"))
        tfr.write_tfrecords(df, str(tmp_path / "b"))
        import os

        compared = 0
        for name in os.listdir(tmp_path / "a"):
            if name.endswith(".tfrecord"):
                ba = (tmp_path / "a" / name).read_bytes()
                bb = (tmp_path / "b" / name).read_bytes()
                assert ba == bb
                compared += 1
        assert compared > 0, os.listdir(tmp_path / "a")



class TestCrcCombine:
    """GF(2) zero-advance combine + the long-record / memory-cap paths."""

    def test_combine_identity(self):
        rng = np.random.default_rng(11)
        for _ in range(20):
            a = rng.integers(0, 256, int(rng.integers(0, 2000)), dtype=np.uint8).tobytes()
            b = rng.integers(0, 256, int(rng.integers(0, 2000)), dtype=np.uint8).tobytes()
            assert tfr.crc32c_combine(_crc32c(a), _crc32c(b), len(b)) == _crc32c(a + b)

    @pytest.mark.parametrize(
        "length", [0, 1, 4095, 4096, 4097, 65536, 65537, 200001, 1 << 20]
    )
    def test_long_record_path(self, length):
        rng = np.random.default_rng(length or 1)
        buf = rng.integers(0, 256, length, dtype=np.uint8).tobytes()
        assert int(tfr._crc32c_batch([buf])[0]) == _crc32c(buf)

    def test_heavy_tailed_batch(self):
        rng = np.random.default_rng(5)
        bufs = [
            rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
            for n in list(rng.integers(0, 300, 100)) + [70000, 0, 5]
        ]
        assert [int(x) for x in tfr._crc32c_batch(bufs)] == [_crc32c(b) for b in bufs]

    def test_memory_stays_near_sum_of_lengths(self):
        """One big record must not pad the whole batch to its length:
        512 x 8 MB dense would be ~4 GB; the cap keeps peak ~_PAD_CAP."""
        import tracemalloc

        bufs = [bytes(8 << 20)] + [bytes(1024)] * 512
        tracemalloc.start()
        tfr._crc32c_batch(bufs)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert peak < 64e6, peak


@pytest.mark.usefixtures("spark")
class TestExactness:
    """The Arrow (not pandas) data path is load-bearing: int64 exactness
    with NULLs present, and NULL vs NaN distinction."""

    def test_big_int64_with_null_in_batch(self, spark, tmp_path):
        big = (1 << 62) + 1  # corrupts via float64 if pandas mediates
        df = spark.createDataFrame([(1, big), (2, None)], "id long, v long")
        tfr.write_tfrecords(df.repartition(1), str(tmp_path))
        rows = {r["id"]: r["v"] for r in tfr.read_tfrecords(spark, str(tmp_path)).collect()}
        assert rows[1] == big and rows[2] is None

    def test_nan_float_roundtrips_as_nan_not_null(self, spark, tmp_path):
        import math

        df = spark.createDataFrame(
            [(1, float("nan")), (2, None), (3, 1.5)], "id long, f float"
        )
        tfr.write_tfrecords(df.repartition(1), str(tmp_path))
        rows = {r["id"]: r["f"] for r in tfr.read_tfrecords(spark, str(tmp_path)).collect()}
        assert math.isnan(rows[1]) and rows[2] is None and rows[3] == 1.5


@pytest.mark.usefixtures("spark")
class TestGzipCompression:
    def test_gzip_roundtrip_and_determinism(self, spark, tmp_path):
        import gzip
        import os

        df = self._df(spark)
        tfr.write_tfrecords(df.repartition(1).sortWithinPartitions("id"),
                            str(tmp_path / "a"), compression="gzip")
        tfr.write_tfrecords(df.repartition(1).sortWithinPartitions("id"),
                            str(tmp_path / "b"), compression="gzip")
        shards = [n for n in os.listdir(tmp_path / "a") if n.endswith(".tfrecord.gz")]
        assert shards, "gzip shards must carry the .gz suffix"
        for n in shards:
            ba = (tmp_path / "a" / n).read_bytes()
            assert ba[:2] == b"\x1f\x8b"
            assert ba == (tmp_path / "b" / n).read_bytes()  # mtime pinned
            # the payload is an ordinary TFRecord stream
            assert len(tfr.parse_records(gzip.decompress(ba))) == 3
        rows = {r["id"]: r for r in tfr.read_tfrecords(spark, str(tmp_path / "a")).collect()}
        assert rows[1]["txt"] == "hello" and rows[2]["txt"] is None

    def test_unknown_compression_is_loud(self, spark, tmp_path):
        with pytest.raises(ValueError, match="unsupported compression"):
            tfr.write_tfrecords(self._df(spark), str(tmp_path), compression="zstd")

    def _df(self, spark):
        return _mixed_types_df(spark)


def test_uncompressed_shard_with_gzip_magic_prefix(tmp_path):
    """A record of exactly 0x8B1F bytes makes an uncompressed shard START
    with the gzip magic; the reader must dispatch on the .gz suffix, not
    sniff content, or this valid shard becomes unreadable."""
    rec = b"x" * 0x8B1F
    blob = tfr.frame_records([rec])
    assert blob[:2] == b"\x1f\x8b"  # the trap is real
    assert tfr.parse_records(blob) == [rec]


def test_decode_pruning_skips_unwanted_features():
    ex = tfr.encode_example({
        "keep": ("int64", [1]),
        "big": ("bytes", [b"z" * 1000]),
    })
    got = tfr.decode_example(ex, wanted=frozenset({"keep"}))
    assert got == {"keep": ("int64", [1])}
    # corrupt the SKIPPED feature's payload region: pruned decode must
    # not even look at it
    broken = bytearray(ex)
    idx = bytes(broken).find(b"z" * 10)
    broken[idx] ^= 0xFF
    assert tfr.decode_example(bytes(broken), wanted=frozenset({"keep"})) == {
        "keep": ("int64", [1])
    }


@pytest.mark.usefixtures("spark")
class TestStreamingSink:
    def test_foreachbatch_appends_and_skips_replays(self, spark, tmp_path):
        sink = tfr.tfrecord_stream_sink(str(tmp_path), shard_records=8)
        b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, txt string")
        b1 = spark.createDataFrame([(3, "c")], "id long, txt string")
        sink(b0, 0)
        sink(b1, 1)
        sink(b0, 0)  # replay of an old batch id: must be a no-op
        got = sorted(
            (r["id"], r["txt"])
            for r in tfr.read_tfrecords(spark, str(tmp_path)).collect()
        )
        assert got == [(1, "a"), (2, "b"), (3, "c")]
        import os

        names = sorted(n for n in os.listdir(tmp_path) if n.endswith(".tfrecord"))
        assert all(n.startswith("batch-") for n in names)
        # manifest covers both batches
        import json as _json

        meta = _json.loads((tmp_path / "_xbs_tfrecord_meta.json").read_text())
        assert meta["shards"] == names

    def test_schema_drift_is_loud(self, spark, tmp_path):
        sink = tfr.tfrecord_stream_sink(str(tmp_path))
        sink(spark.createDataFrame([(1, "a")], "id long, txt string"), 0)
        with pytest.raises(Exception, match="different schema"):
            sink(spark.createDataFrame([(1.5,)], "f float"), 1)

    def test_real_stream_available_now(self, spark, tmp_path):
        """End-to-end through Structured Streaming: file-source batches →
        foreachBatch sink → read back the exact row set."""
        src_dir = tmp_path / "src"
        out = tmp_path / "out"
        spark.createDataFrame(
            [(i, f"doc-{i}") for i in range(40)], "id long, txt string"
        ).repartition(4).write.parquet(str(src_dir))
        src = (
            spark.readStream.schema("id long, txt string")
            .option("maxFilesPerTrigger", "2")  # several micro-batches
            .parquet(str(src_dir))
        )
        q = (
            src.writeStream.foreachBatch(tfr.tfrecord_stream_sink(str(out)))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        back = tfr.read_tfrecords(spark, str(out))
        assert sorted(r["id"] for r in back.collect()) == list(range(40))


class TestMalformedProtobuf:
    """Foreign/corrupt records must decode loudly, never silently
    truncated: the container CRC only covers our own shards."""

    def test_truncated_example_is_loud(self):
        enc = tfr.encode_example({"txt": ("bytes", [b"hello"])})
        for cut in (1, 2, 3, 4):
            with pytest.raises(ValueError, match="truncated"):
                tfr.decode_example(enc[:-cut])

    def test_packed_float_length_not_multiple_of_4_is_loud(self):
        float_list = tfr._ld(1, b"\x00\x01\x02")  # 3-byte packed payload
        feature = tfr._ld(2, float_list)  # Feature.float_list = 2
        entry = tfr._ld(1, b"f") + tfr._ld(2, feature)
        example = tfr._ld(1, tfr._ld(1, entry))
        with pytest.raises(ValueError, match="multiple of 4"):
            tfr.decode_example(example)

    def test_overlong_length_in_skipped_field_is_loud(self):
        # unknown field whose declared length overruns the buffer must
        # raise even though its value is never materialized
        bogus = tfr._varint((9 << 3) | 2) + tfr._varint(1000) + b"xx"
        enc = tfr.encode_example({"a": ("int64", [1])})
        with pytest.raises(ValueError, match="truncated"):
            tfr.decode_example(enc + bogus)

    def test_truncated_packed_int64_is_loud(self):
        int_list = tfr._ld(1, b"\x80")  # declared 1 byte, varint continues
        feature = tfr._ld(3, int_list)  # Feature.int64_list = 3
        entry = tfr._ld(1, b"i") + tfr._ld(2, feature)
        example = tfr._ld(1, tfr._ld(1, entry))
        with pytest.raises(ValueError):
            tfr.decode_example(example)


class TestManifestAndFilesOverride:
    def test_empty_dataset_roundtrips_as_zero_rows(self, spark, tmp_path):
        """An empty-but-present manifest (e.g. an empty first streaming
        micro-batch wrote shards=[]) is a valid empty dataset, not
        FileNotFoundError."""
        df = spark.createDataFrame([], "id long, txt string")
        stats = tfr.write_tfrecords(df, str(tmp_path))
        assert stats["records"] == 0 and stats["shards"] == 0
        back = tfr.read_tfrecords(spark, str(tmp_path))
        assert back.columns == ["id", "txt"]
        assert back.count() == 0

    def test_files_override_reads_sidecarless_dir(self, spark, tmp_path):
        """Foreign shard sets with neither sidecar nor listing (plain-http
        tf.data exports) are readable by explicit shard list + schema."""
        import os

        from pyspark.sql import functions as F

        df = spark.range(10).select(F.col("id"))
        tfr.write_tfrecords(df.repartition(1), str(tmp_path), shard_records=5)
        os.remove(tmp_path / "_xbs_tfrecord_meta.json")
        shards = sorted(n for n in os.listdir(tmp_path) if n.endswith(".tfrecord"))
        assert len(shards) == 2
        got = tfr.read_tfrecords(
            spark, str(tmp_path), "id long", files=shards[:1]
        )
        assert got.count() == 5
        # explicit empty list = empty dataset, schema preserved
        empty = tfr.read_tfrecords(spark, str(tmp_path), "id long", files=[])
        assert empty.count() == 0 and empty.columns == ["id"]


class TestReviewRegressions:
    """Round-12 module-review findings, pinned."""

    def test_noncanonical_varint_masked_to_64_bits(self):
        # Int64List value 2^65 encoded as a 10-byte varint: protobuf
        # semantics are value mod 2^64, so this must decode as 0 — not a
        # >64-bit python int that _signed64 mis-normalizes
        int_list = tfr._ld(1, bytes([0x80] * 9 + [0x04]))
        feature = tfr._ld(3, int_list)
        entry = tfr._ld(1, b"i") + tfr._ld(2, feature)
        example = tfr._ld(1, tfr._ld(1, entry))
        assert tfr.decode_example(example) == {"i": ("int64", [0])}

    def test_null_array_element_named_loudly(self, spark, tmp_path):
        df = spark.createDataFrame([([1, None],)], "arr array<long>")
        with pytest.raises(Exception, match="arr.*NULL array element"):
            tfr.write_tfrecords(df, str(tmp_path))

    def test_multivalue_feature_into_scalar_column_is_loud(self, spark, tmp_path):
        df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "x array<float>")
        tfr.write_tfrecords(df, str(tmp_path))
        with pytest.raises(Exception, match="3 values.*scalar"):
            tfr.read_tfrecords(spark, str(tmp_path), "x float").collect()


class TestBoundedBatches:
    """A shard whose rows exceed ``batch_bytes`` must leave the read
    task as MULTIPLE RecordBatches (the bounded-memory contract) and
    still round-trip exactly."""

    def test_multiple_batches_per_shard_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.range(200).select(
            "id", F.concat(F.lit("t" * 500), F.col("id").cast("string")).alias("txt")
        )
        # ONE shard of 200 ~500 B rows, read back with a 2 KB flush
        # bound -> ~50 flushes inside one task
        tfr.write_tfrecords(df.repartition(1), str(tmp_path), shard_records=1000)
        back = tfr.read_tfrecords(spark, str(tmp_path), batch_bytes=2048)
        rows = {r["id"]: r["txt"] for r in back.collect()}
        assert len(rows) == 200
        assert rows[7] == "t" * 500 + "7"

    def test_gz_shard_streams_through_gunzip(self, spark, tmp_path):
        df = spark.range(50).withColumnRenamed("id", "v")
        tfr.write_tfrecords(df.repartition(1), str(tmp_path), compression="gzip")
        back = tfr.read_tfrecords(spark, str(tmp_path), batch_bytes=64)
        assert sorted(r["v"] for r in back.collect()) == list(range(50))
