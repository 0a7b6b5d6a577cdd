"""Bounded-memory shard-ingest machinery (bytestream + stores.iter_blob).

The shard readers (WARC/WET, TFRecord, WebDataset) must be
O(record + batch) per task regardless of shard size — a foreign Common
Crawl WARC is ~1 GB gzip / ~4-5 GB decoded, and the pre-streaming shape
(whole blob + whole decompressed stream + whole row list + one
RecordBatch, simultaneously) cost ~10+ GB per task.  These tests pin:

* the incremental framers agree with the whole-buffer parsers at EVERY
  chunk boundary (1-byte chunks included),
* allocation stays bounded while a large multi-record stream passes
  through (tracemalloc peak ~ record size, not stream size),
* the readers emit MULTIPLE RecordBatches per shard when rows exceed
  ``batch_bytes`` and the multi-batch path round-trips exactly,
* ``stores.iter_blob`` streams via ranged reads on backends that have
  them and falls back to one whole ``get`` (never O(n^2)) otherwise.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import tracemalloc
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_beam_spark.sources import bytestream, stores, tfrecord, warc


def _chunked(buf: bytes, size: int):
    return [buf[i : i + size] for i in range(0, len(buf), size)]


def _member(data: bytes) -> bytes:
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
        gz.write(data)
    return out.getvalue()


class TestIterGunzip:
    def test_multi_member_all_chunkings(self):
        parts = [b"alpha" * 7, b"", b"beta\n" * 100, b"x"]
        stream = b"".join(_member(p) for p in parts)
        want = b"".join(parts)
        for size in (1, 2, 7, 64, len(stream), len(stream) + 5):
            got = b"".join(bytestream.iter_gunzip(_chunked(stream, size)))
            assert got == want, size

    def test_truncated_final_member_is_loud(self):
        stream = _member(b"hello world") + _member(b"tail")[:-4]
        with pytest.raises(ValueError, match="truncated gzip member"):
            list(bytestream.iter_gunzip(_chunked(stream, 3)))

    def test_trailing_garbage_is_loud(self):
        stream = _member(b"ok") + b"not gzip at all"
        with pytest.raises(zlib.error):
            list(bytestream.iter_gunzip(_chunked(stream, 5)))

    @given(
        st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
        st.integers(min_value=1, max_value=97),
    )
    @settings(max_examples=40, deadline=None)
    def test_property_any_members_any_chunking(self, parts, size):
        stream = b"".join(_member(p) for p in parts)
        got = b"".join(bytestream.iter_gunzip(_chunked(stream, size)))
        assert got == b"".join(parts)


class TestIterWarcRecords:
    def _records(self, n: int, body: bytes = b"payload text") -> bytes:
        out = []
        for i in range(n):
            out.append(
                warc._record_bytes(
                    [
                        ("WARC-Type", "conversion"),
                        ("WARC-Target-URI", f"http://x/{i}"),
                        ("WARC-Date", "2026-01-01T00:00:00Z"),
                        ("WARC-Record-ID", f"<urn:uuid:{i}>"),
                        ("Content-Type", "text/plain"),
                    ],
                    body + str(i).encode(),
                )
            )
        return b"".join(out)

    def test_every_chunk_boundary_matches_whole_buffer(self):
        buf = self._records(5)
        want = warc.parse_warc(buf)
        for size in (1, 2, 3, 17, 100, len(buf)):
            got = list(warc.iter_warc_records(_chunked(buf, size)))
            assert got == want, size

    def test_gzip_sniff_with_one_byte_first_chunk(self):
        # the magic sniff must survive a 1-byte first chunk
        buf = self._records(3)
        gz = _member(buf)
        got = list(warc._iter_warc_stream(_chunked(gz, 1)))
        assert got == warc.parse_warc(buf)

    def test_truncated_payload_is_loud_at_any_chunking(self):
        buf = self._records(2)[:-10]
        for size in (1, 7, len(buf)):
            with pytest.raises(ValueError, match="truncated WARC payload"):
                list(warc.iter_warc_records(_chunked(buf, size)))

    def test_unterminated_header_is_loud(self):
        with pytest.raises(ValueError, match="unterminated WARC header"):
            list(warc.iter_warc_records([b"WARC/1.0\r\nName: value\r\n"]))

    def test_bounded_allocation_on_large_stream(self):
        # ~48 MB of decoded records through the full gz route: peak
        # traced allocation must scale with ONE record (+ chunk), not
        # the stream.  The old whole-shard shape would peak >= 96 MB
        # here (decompressed copy + record list); the bound below is
        # ~25x under that and ~6x over the honest O(record+chunk) cost.
        rec = self._records(1, body=b"z" * (256 << 10))  # ~256 KB/record
        n = 192
        gz_whole = _member(rec * n)  # ONE member: decompressor-bounded too

        def chunks():
            view = memoryview(gz_whole)
            for i in range(0, len(view), 1 << 20):
                yield bytes(view[i : i + (1 << 20)])

        tracemalloc.start()
        count = 0
        for r in warc._iter_warc_stream(chunks()):
            count += 1
            assert len(r["payload"]) >= 256 << 10
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert count == n
        assert peak < 4 << 20, f"peak {peak} bytes is not O(record + chunk)"


class TestIterTfrecordStream:
    def test_every_chunk_boundary_matches_whole_buffer(self):
        recs = [b"a" * 5, b"", b"c" * 300, b"dd"]
        buf = tfrecord.frame_records(recs)
        for size in (1, 2, 13, len(buf)):
            got = list(tfrecord.iter_records_stream(_chunked(buf, size)))
            assert got == recs, size

    def test_crc_mismatch_is_loud_across_chunks(self):
        buf = bytearray(tfrecord.frame_records([b"payload-bytes"]))
        buf[14] ^= 0x01  # flip a data byte
        with pytest.raises(ValueError, match="data crc mismatch"):
            list(tfrecord.iter_records_stream(_chunked(bytes(buf), 3)))

    def test_truncation_is_loud(self):
        buf = tfrecord.frame_records([b"abcdef"])
        with pytest.raises(ValueError, match="truncated TFRecord"):
            list(tfrecord.iter_records_stream(_chunked(buf[:-2], 4)))
        with pytest.raises(ValueError, match="truncated TFRecord header"):
            list(tfrecord.iter_records_stream([buf + b"\x01\x02"]))

    def test_verify_groups_flush_mid_stream(self, monkeypatch):
        # shrink the group bound so several groups flush before EOF
        monkeypatch.setattr(tfrecord, "_VERIFY_GROUP_BYTES", 64)
        recs = [bytes([i]) * 40 for i in range(10)]
        buf = tfrecord.frame_records(recs)
        assert list(tfrecord.iter_records_stream(_chunked(buf, 7))) == recs


class TestChunkReader:
    def test_tarfile_stream_mode(self):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            for name, data in [("a.txt", b"alpha"), ("b.txt", b"b" * 7000)]:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        f = bytestream.reader(_chunked(buf.getvalue(), 100))
        with tarfile.open(fileobj=f, mode="r|*") as tar:
            members = {m.name: tar.extractfile(m).read() for m in tar if m.isfile()}
        assert members == {"a.txt": b"alpha", "b.txt": b"b" * 7000}

    def test_empty_chunks_are_skipped(self):
        f = bytestream.reader([b"", b"ab", b"", b"c"])
        assert f.read() == b"abc"


class TestBatchBuilder:
    def _schema(self):
        import pyarrow as pa

        return pa.schema([("k", pa.string()), ("v", pa.int64())])

    def test_flushes_at_bound_and_final_always_emits(self):
        bb = bytestream.BatchBuilder(self._schema(), flush_bytes=200)
        batches = []
        for i in range(10):
            bb.rows["k"].append(str(i))
            bb.rows["v"].append(i)
            batches.extend(bb.note(10))
        batches.append(bb.final())
        assert len(batches) > 1
        rows = [r for b in batches for r in b.to_pylist()]
        assert rows == [{"k": str(i), "v": i} for i in range(10)]
        empty = bytestream.BatchBuilder(self._schema(), flush_bytes=200)
        assert empty.final().num_rows == 0


class TestIterBlob:
    def test_fs_store_streams_ranged(self, tmp_path):
        p = tmp_path / "blob.bin"
        data = bytes(range(256)) * 700  # ~175 KB
        p.write_bytes(data)
        store, key = stores.resolve(str(p))
        got = list(stores.iter_blob(store, key, chunk_size=1 << 16))
        assert b"".join(got) == data
        assert len(got) == 3  # 175 KB in 64 KB chunks
        assert all(len(c) <= 1 << 16 for c in got)

    def test_missing_raises_custom_message(self, tmp_path):
        store, key = stores.resolve(str(tmp_path / "nope"))
        with pytest.raises(FileNotFoundError, match="gone-gone"):
            list(stores.iter_blob(store, key, missing="gone-gone"))

    def test_exact_multiple_of_chunk(self, tmp_path):
        p = tmp_path / "blob.bin"
        p.write_bytes(b"x" * (4 << 10))
        store, key = stores.resolve(str(p))
        got = list(stores.iter_blob(store, key, chunk_size=1 << 10))
        assert b"".join(got) == b"x" * (4 << 10) and len(got) == 4

    def test_rangeless_backend_takes_one_get(self):
        calls = []

        class Counting(stores.Store):
            def get(self, key):
                calls.append(key)
                return b"y" * 1000

        got = list(stores.iter_blob(Counting(), "k", chunk_size=64))
        assert b"".join(got) == b"y" * 1000
        assert calls == ["k"]  # one fetch, sliced — never O(n^2)

    def test_empty_object_yields_no_chunks(self, tmp_path):
        p = tmp_path / "empty.bin"
        p.write_bytes(b"")
        store, key = stores.resolve(str(p))
        assert list(stores.iter_blob(store, key)) == []


class TestRangeDegradation:
    """iter_blob against backends whose ranged reads secretly transfer
    the whole object (r13 review findings)."""

    def test_base_get_tail_zero_is_empty(self):
        class S(stores.Store):
            def get(self, key):
                return b"abcdef"

        assert S().get_tail("k", 0) == b""
        assert S().get_tail("k", 3) == b"def"

    def test_degraded_ranges_fall_back_to_one_get(self):
        """A store that reports ranges_degraded after the first 'ranged'
        read must be served with ONE extra whole get — total transfer
        ~2x the object, never n_chunks x object."""
        data = bytes(range(256)) * 1000  # 256 KB

        class Degraded(stores.Store):
            def __init__(self):
                self.range_calls = 0
                self.get_calls = 0

            def get(self, key):
                self.get_calls += 1
                return data

            def get_range(self, key, start, length):
                self.range_calls += 1
                return data[start : start + length]

            def ranges_degraded(self, key):
                return self.range_calls > 0

        st = Degraded()
        got = b"".join(stores.iter_blob(st, "k", chunk_size=1 << 14))
        assert got == data
        assert st.range_calls == 1  # first probe only
        assert st.get_calls == 1  # one whole-object fallback

    def test_mem_store_concurrent_put_during_listing(self):
        import threading

        ms = stores.MemStore()
        for i in range(2000):
            ms.put(f"a/{i}", b"x")
        errs = []
        barrier = threading.Barrier(2)

        def writer():
            barrier.wait()
            for i in range(20000):  # bounded: keeps the reader O(n) total
                ms.put(f"a/new{i}", b"y")

        def reader():
            barrier.wait()
            try:
                for _ in range(200):
                    ms.list_dir("a")
                    ms.exists("a")
            except RuntimeError as e:  # dict changed size during iteration
                errs.append(e)

        t = threading.Thread(target=writer)
        t.start()
        reader()
        t.join()
        assert not errs


class TestR13NewCodeReview:
    """Adversarial review fixes over the round-13 streaming-ingest code."""

    def test_dechunk_rejects_negative_and_prefixed_sizes(self):
        from xarray_beam_spark.sources.warc import _dechunk

        # int(tok, 16) would parse the sign, move pos BACKWARDS, and
        # silently return garbage re-read from consumed bytes
        with pytest.raises(ValueError, match="bad chunk size"):
            _dechunk(b"-b\r\nXQ\r\n0\r\n\r\n")
        with pytest.raises(ValueError, match="bad chunk size"):
            _dechunk(b"0x2\r\nab\r\n0\r\n\r\n")
        with pytest.raises(ValueError, match="bad chunk size"):
            _dechunk(b"+2\r\nab\r\n0\r\n\r\n")
        assert _dechunk(b"2\r\nab\r\n0\r\n\r\n") == b"ab"

    def test_tfrecord_corrupt_length_fails_fast_and_bounded(self):
        # a flipped high bit in a length field must raise a LENGTH crc
        # mismatch at the first incomplete-buffer break, not buffer the
        # whole remaining stream and die with 'truncated'
        buf = bytearray(tfrecord.frame_records([b"x" * 50, b"y" * 50]))
        buf[6] |= 0x40  # blow the first record's length into the TBs
        chunks = _chunked(bytes(buf), 16)
        with pytest.raises(ValueError, match="length crc mismatch"):
            list(tfrecord.iter_records_stream(chunks))

    def test_response_record_ids_distinct_per_content_type(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("http://a/1", "same body", "text/html"),
             ("http://a/1", "same body", "text/plain")],
            "url string, body string, ct string",
        )
        warc.write_warc_responses(
            df.repartition(1).sortWithinPartitions("ct"),
            str(tmp_path),
            content_type_col="ct",
        )
        back = warc.read_warc_responses(spark, str(tmp_path)).collect()
        ids = [r["record_id"] for r in back]
        assert len(ids) == 2 and ids[0] != ids[1]

    def test_wds_reader_missing_key_col_is_loud_at_plan_time(self, spark, tmp_path):
        from xarray_beam_spark.sources import webdataset as wds

        df = spark.createDataFrame(
            [("k1", "alpha")], "__key__ string, txt string"
        )
        wds.write_webdataset(df.repartition(1), str(tmp_path))
        with pytest.raises(ValueError, match="key column"):
            wds.read_webdataset(spark, str(tmp_path), schema="txt string")
        with pytest.raises(TypeError, match="must be string"):
            wds.read_webdataset(
                spark, str(tmp_path), schema="__key__ long, txt string"
            )


def test_all_shard_readers_wire_batch_bytes_through():
    """The bounded-memory contract needs every shard reader to hand its
    batch_bytes knob to BatchBuilder — a reader that drops the argument
    still round-trips rows (one whole-shard batch), so only this wiring
    sweep catches the regression at the reader layer (flush behavior
    itself is pinned by TestBatchBuilder)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "xarray_beam_spark" / "sources"
    for mod, expected in (
        ("warc.py", 2),  # read_wet + read_warc_responses
        ("tfrecord.py", 1),
        ("webdataset.py", 1),
    ):
        src = (root / mod).read_text()
        n = src.count("bytestream.BatchBuilder(pa_schema, batch_bytes)")
        assert n >= expected, f"{mod}: BatchBuilder(batch_bytes) wiring missing"
