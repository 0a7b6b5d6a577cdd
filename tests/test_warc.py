"""WARC / WET (ISO 28500) source/sink tests.

Golden framing is pinned byte-for-byte against the spec's record
grammar, foreign fixtures exercise the tolerances real files need
(bare-LF header blocks, plain vs multi-member-gzip, mixed record
types), and corruption fails loudly.
"""

from __future__ import annotations

import gzip
import os
import re

import pytest

from xarray_beam_spark.sources import warc


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    return warc._record_bytes(headers, payload)


class TestParser:
    def test_golden_record(self):
        rec = _record(
            [("WARC-Type", "conversion"), ("WARC-Target-URI", "http://x/1")],
            b"hello",
        )
        assert rec == (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://x/1\r\n"
            b"Content-Length: 5\r\n"
            b"\r\n"
            b"hello"
            b"\r\n\r\n"
        )
        (got,) = warc.parse_warc(rec)
        assert got["headers"]["warc-type"] == "conversion"
        assert got["payload"] == b"hello"

    def test_multiple_records_and_gzip_members(self):
        a = _record([("WARC-Type", "conversion")], b"one")
        b = _record([("WARC-Type", "conversion")], b"two")
        # plain concatenation
        assert [r["payload"] for r in warc.parse_warc(a + b)] == [b"one", b"two"]
        # Common Crawl convention: one gzip member per record
        blob = warc._gzip_member(a) + warc._gzip_member(b)
        assert [r["payload"] for r in warc.parse_warc(blob)] == [b"one", b"two"]

    def test_bare_lf_headers_tolerated(self):
        rec = b"WARC/1.0\nWARC-Type: conversion\nContent-Length: 3\n\nabc\r\n\r\n"
        (got,) = warc.parse_warc(rec)
        assert got["payload"] == b"abc"

    def test_payload_containing_warc_magic(self):
        # Content-Length framing means payload bytes are NEVER scanned
        body = b"WARC/1.0\r\nnot a real record"
        rec = _record([("WARC-Type", "conversion")], body)
        (got,) = warc.parse_warc(rec)
        assert got["payload"] == body

    def test_bad_magic_is_loud(self):
        with pytest.raises(ValueError, match="WARC/ magic"):
            warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")

    def test_truncated_payload_is_loud(self):
        rec = _record([("WARC-Type", "conversion")], b"hello")
        with pytest.raises(ValueError, match="truncated"):
            warc.parse_warc(rec[:-9])  # cut into the payload

    def test_missing_content_length_is_loud(self):
        rec = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nxx\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            warc.parse_warc(rec)


@pytest.mark.usefixtures("spark")
class TestSparkWet:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                ("http://a.com/1", "hello wörld"),
                ("http://b.com/2", "line one\nline two"),
            ],
            "url string, text string",
        )

    def test_roundtrip(self, spark, tmp_path):
        stats = warc.write_wet(self._df(spark).repartition(2, "url"), str(tmp_path))
        assert stats["records"] == 2
        rows = {r["url"]: r for r in warc.read_wet(spark, str(tmp_path)).collect()}
        assert rows["http://a.com/1"]["text"] == "hello wörld"
        assert rows["http://a.com/1"]["content_length"] == len("hello wörld".encode())
        assert rows["http://b.com/2"]["text"] == "line one\nline two"
        assert rows["http://a.com/1"]["record_id"].startswith("<urn:uuid:")

    def test_deterministic_bytes(self, spark, tmp_path):
        df = self._df(spark).repartition(1).sortWithinPartitions("url")
        warc.write_wet(df, str(tmp_path / "a"))
        warc.write_wet(df, str(tmp_path / "b"))
        compared = 0
        for n in os.listdir(tmp_path / "a"):
            if n.endswith(".gz"):
                assert (tmp_path / "a" / n).read_bytes() == (
                    tmp_path / "b" / n
                ).read_bytes()
                compared += 1
        # a suffix/compression-default change must not turn this into a
        # zero-comparison vacuous pass
        assert compared > 0, os.listdir(tmp_path / "a")

    def test_warcinfo_header_record(self, spark, tmp_path):
        warc.write_wet(self._df(spark).repartition(1), str(tmp_path))
        shard = next(n for n in os.listdir(tmp_path) if n.endswith(".gz"))
        raw = gzip.decompress((tmp_path / shard).read_bytes())
        assert raw.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")

    def test_null_rows_refused(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("http://a.com/1", None)], "url string, text string"
        )
        with pytest.raises(Exception, match="url and text"):
            warc.write_wet(df, str(tmp_path))

    def test_foreign_mixed_warc(self, spark, tmp_path):
        """A hand-built plain (uncompressed, bare-name) WARC with request/
        response records interleaved: only conversions become rows."""
        blob = b"".join(
            [
                _record([("WARC-Type", "request")], b"GET / HTTP/1.1"),
                _record(
                    [
                        ("WARC-Type", "conversion"),
                        ("WARC-Target-URI", "http://f.com/x"),
                        ("WARC-Date", "2020-05-05T00:00:00Z"),
                    ],
                    b"foreign text",
                ),
                _record([("WARC-Type", "response")], b"HTTP/1.1 200 OK\r\n\r\nbody"),
            ]
        )
        (tmp_path / "crawl.warc").write_bytes(blob)
        got = warc.read_wet(spark, str(tmp_path)).collect()
        assert len(got) == 1
        assert got[0]["url"] == "http://f.com/x"
        assert got[0]["warc_date"] == "2020-05-05T00:00:00Z"
        assert got[0]["text"] == "foreign text"

    def test_explicit_file_list(self, spark, tmp_path):
        """The wet.paths workflow: hand the reader a manifest slice."""
        warc.write_wet(self._df(spark).repartition(1), str(tmp_path), shard_records=1)
        shards = sorted(n for n in os.listdir(tmp_path) if n.endswith(".gz"))
        assert len(shards) == 2
        got = warc.read_wet(spark, str(tmp_path), files=shards[:1])
        assert got.count() == 1

    def test_shard_splitting(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.range(20).select(
            F.concat(F.lit("http://s.com/"), F.col("id").cast("string")).alias("url"),
            F.col("id").cast("string").alias("text"),
        )
        warc.write_wet(df.repartition(1), str(tmp_path), shard_records=6)
        shards = [n for n in os.listdir(tmp_path) if n.endswith(".gz")]
        assert len(shards) == 4  # 3 full + remainder of 2
        assert warc.read_wet(spark, str(tmp_path)).count() == 20

    def test_mem_store_refused(self, spark):
        with pytest.raises(ValueError, match="process-local"):
            warc.write_wet(self._df(spark), "mem://nope/wet")
        with pytest.raises(ValueError, match="process-local"):
            warc.read_wet(spark, "mem://nope/wet")


class TestParserHardening:
    """Findings from review: adversarial shapes must stay O(n) and loud."""

    def test_no_blank_line_payloads_parse_in_linear_time(self):
        import time

        recs = b"".join(
            _record(
                [("WARC-Type", "conversion"), ("WARC-Target-URI", f"http://x/{i}")],
                b"single paragraph, no blank lines " * 10,
            )
            for i in range(5000)
        )
        t0 = time.monotonic()
        assert len(warc.parse_warc(recs)) == 5000
        # generous margin for loaded CI hosts; the quadratic scan this
        # pins took ~30 s, so 15 s still separates the regimes cleanly
        assert time.monotonic() - t0 < 15.0

    def test_negative_content_length_is_loud(self):
        with pytest.raises(ValueError, match="negative Content-Length"):
            warc.parse_warc(b"WARC/1.0\r\nContent-Length: -33\r\n\r\n")

    def test_folded_header_continuation(self):
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://x/\r\n"
            b" very/long:path\r\n"
            b"Content-Length: 2\r\n"
            b"\r\nok\r\n\r\n"
        )
        (got,) = warc.parse_warc(rec)
        assert got["headers"]["warc-target-uri"] == "http://x/ very/long:path"

    def test_continuation_before_any_header_is_loud(self):
        rec = b"WARC/1.0\r\n folded\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        with pytest.raises(ValueError, match="continuation"):
            warc.parse_warc(rec)

    def test_unicode_line_separators_in_header_values(self):
        # U+0085 NEL (and U+2028-class chars) are line boundaries to
        # str.splitlines but NOT to the WARC grammar
        uri = "http://x/ab\u0085c"
        rec = _record(
            [("WARC-Type", "conversion"), ("WARC-Target-URI", uri)], b"x"
        )
        (got,) = warc.parse_warc(rec)
        assert got["headers"]["warc-target-uri"] == uri


@pytest.mark.usefixtures("spark")
class TestRecordIds:
    def test_same_url_different_text_distinct_ids(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("http://dup.com/x", "first crawl"), ("http://dup.com/x", "second crawl")],
            "url string, text string",
        )
        warc.write_wet(df.repartition(1), str(tmp_path))
        got = warc.read_wet(spark, str(tmp_path)).collect()
        ids = {r["record_id"] for r in got}
        assert len(ids) == 2


class TestParserProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), blacklist_characters="\r\n"
                    ),
                    min_size=1,
                    max_size=30,
                ),
                st.binary(max_size=200),
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_record_roundtrip(self, samples):
        """encode -> parse is the identity on (headers subset, payload)
        for arbitrary UTF-8 URI values and arbitrary payload bytes
        (including payloads that contain WARC magic / blank lines)."""
        blob = b"".join(
            _record(
                [("WARC-Type", "conversion"), ("WARC-Target-URI", uri)], payload
            )
            for uri, payload in samples
        )
        got = warc.parse_warc(blob)
        assert len(got) == len(samples)
        for (uri, payload), rec in zip(samples, got):
            # LWS folding canonicalizes interior whitespace runs that
            # START a continuation; values without leading/trailing LWS
            # round-trip exactly
            assert rec["headers"]["warc-target-uri"] == uri.strip()
            assert rec["payload"] == payload


class TestGunzipMembers:
    def test_matches_stdlib_and_is_linear(self):
        import time

        blob = b"".join(
            warc._gzip_member(_record([("WARC-Type", "conversion")], b"y" * 500))
            for _ in range(4000)
        )
        t0 = time.monotonic()
        got = warc.gunzip_members(blob)
        elapsed = time.monotonic() - t0
        assert got == gzip.decompress(blob)
        # stdlib's per-member remainder copies take >10 s on this input;
        # 8 s keeps clear air above loaded-CI jitter while still
        # separating the quadratic regime
        assert elapsed < 8.0

    def test_single_member_and_empty(self):
        one = warc._gzip_member(b"hello" * 1000)
        assert warc.gunzip_members(one) == gzip.decompress(one)
        assert warc.gunzip_members(b"") == b""

    def test_truncated_member_is_loud(self):
        blob = warc._gzip_member(b"payload" * 100)
        # ValueError specifically: the parser-fuzz loudness contract — a
        # bare Exception would also bless an unrelated AttributeError
        with pytest.raises(ValueError, match="truncated"):
            warc.gunzip_members(blob[:-5])


class TestHeaderInjectionAndEmptyManifest:
    def test_crlf_in_url_is_loud(self, spark, tmp_path):
        """A newline embedded in a crawled URL must not inject header
        lines (it could flip WARC-Type and silently drop the record)."""
        df = spark.createDataFrame(
            [("http://evil.com/\r\nWARC-Type: warcinfo", "body")],
            "url string, text string",
        )
        with pytest.raises(Exception, match="CR/LF"):
            warc.write_wet(df, str(tmp_path))

    def test_crlf_in_date_is_loud(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("http://a.com/1", "b", "2020-01-01\nX: y")],
            "url string, text string, d string",
        )
        with pytest.raises(Exception, match="CR/LF"):
            warc.write_wet(df, str(tmp_path), date_col="d")

    def test_empty_manifest_reads_as_zero_rows(self, spark, tmp_path):
        df = spark.createDataFrame([], "url string, text string")
        warc.write_wet(df, str(tmp_path))
        got = warc.read_wet(spark, str(tmp_path))
        assert got.count() == 0
        assert "url" in got.columns and "text" in got.columns

    def test_warcinfo_ids_unique_across_shards(self, spark, tmp_path):
        """ISO 28500: record ids globally unique — the per-shard warcinfo
        id derives from the shard name (deterministic, but never shared
        between shards)."""
        warc.write_wet(
            self_df_four(spark).repartition(1), str(tmp_path), shard_records=1
        )
        ids = set()
        for n in sorted(os.listdir(tmp_path)):
            if not n.endswith(".gz"):
                continue
            raw = gzip.decompress((tmp_path / n).read_bytes())
            m = re.search(rb"WARC-Type: warcinfo.*?WARC-Record-ID: (<[^>]+>)", raw, re.S)
            assert m, n
            ids.add(m.group(1))
        assert len(ids) == 4


def self_df_four(spark):
    return spark.createDataFrame(
        [(f"http://x.com/{i}", f"text {i}") for i in range(4)],
        "url string, text string",
    )


class TestHttpResponseParsing:
    """parse_http_response / decode_http_body adversarial fixtures."""

    def _msg(self, head: str, body: bytes) -> bytes:
        return head.encode("latin-1") + b"\r\n\r\n" + body

    def test_golden_response(self):
        payload = self._msg(
            "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8",
            "héllo".encode(),
        )
        status, headers, body = warc.parse_http_response(payload)
        assert status == 200
        assert headers["content-type"] == "text/html; charset=utf-8"
        text, charset = warc.decode_http_body(body, headers["content-type"])
        assert text == "héllo" and charset == "utf-8"

    def test_chunked_transfer_encoding_declared(self):
        chunked = b"5\r\nhello\r\n6;ext=1\r\n world\r\n0\r\nX-Trailer: t\r\n\r\n"
        payload = self._msg(
            "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", chunked
        )
        status, headers, body = warc.parse_http_response(payload)
        assert body == b"hello world"

    def test_truncated_chunk_is_loud(self):
        payload = self._msg(
            "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", b"ff\r\nshort\r\n"
        )
        with pytest.raises(ValueError, match="truncated chunk"):
            warc.parse_http_response(payload)

    def test_bad_chunk_size_is_loud(self):
        payload = self._msg(
            "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", b"zz\r\nhello\r\n"
        )
        with pytest.raises(ValueError, match="chunk size"):
            warc.parse_http_response(payload)

    def test_truncated_http_head_is_loud(self):
        # head cut off before the blank line: must raise, never guess a body
        with pytest.raises(ValueError, match="truncated HTTP head"):
            warc.parse_http_response(b"HTTP/1.1 200 OK\r\nContent-Type: text/h")

    def test_malformed_status_line_is_loud(self):
        with pytest.raises(ValueError, match="status line"):
            warc.parse_http_response(b"<html>not http</html>\r\n\r\nbody")
        with pytest.raises(ValueError, match="status line"):
            warc.parse_http_response(b"HTTP/1.1 OK\r\n\r\nbody")

    def test_non_utf8_charset(self):
        body = "café señor".encode("iso-8859-1")
        text, charset = warc.decode_http_body(
            body, "text/html; charset=ISO-8859-1"
        )
        assert text == "café señor" and charset == "ISO-8859-1"

    def test_unknown_charset_falls_back_to_utf8(self):
        text, charset = warc.decode_http_body(
            "ok".encode(), "text/html; charset=x-martian"
        )
        assert text == "ok" and charset == "x-martian"

    def test_missing_charset_falls_back_to_utf8(self):
        text, charset = warc.decode_http_body("dépôt".encode(), "text/html")
        assert text == "dépôt" and charset is None

    def test_charset_lie_never_dies(self):
        # latin-1 bytes under a utf-8 label: replacement chars, no raise
        text, _ = warc.decode_http_body(
            "é".encode("iso-8859-1"), "text/html; charset=utf-8"
        )
        assert "�" in text

    def test_bare_lf_head_tolerated(self):
        payload = b"HTTP/1.1 404 Not Found\nContent-Type: text/plain\n\nmiss"
        status, headers, body = warc.parse_http_response(payload)
        assert status == 404 and body == b"miss"

    def test_repeated_headers_join(self):
        payload = self._msg(
            "HTTP/1.1 200 OK\r\nSet-Cookie: a=1\r\nSet-Cookie: b=2", b""
        )
        _, headers, _ = warc.parse_http_response(payload)
        assert headers["set-cookie"] == "a=1, b=2"

    def test_http_content_length_does_not_recut_body(self):
        # WARC framing is the authority: a lying HTTP Content-Length
        # must not truncate or extend the captured body
        payload = self._msg("HTTP/1.1 200 OK\r\nContent-Length: 2", b"full body")
        _, _, body = warc.parse_http_response(payload)
        assert body == b"full body"


class TestSparkResponses:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                ("http://a.com/1", "<p>hello wörld</p>", "text/html; charset=utf-8"),
                ("http://b.com/2", "<p>ascii only</p>", "text/html; charset=ISO-8859-1"),
                ("http://c.com/3", "<p>no label</p>", "text/html"),
            ],
            "url string, body string, ct string",
        )

    def test_roundtrip_mixed_charsets(self, spark, tmp_path):
        stats = warc.write_warc_responses(
            self._df(spark).repartition(2, "url"), str(tmp_path), content_type_col="ct"
        )
        assert stats["records"] == 3
        rows = {
            r["url"]: r
            for r in warc.read_warc_responses(spark, str(tmp_path)).collect()
        }
        assert rows["http://a.com/1"]["body"] == "<p>hello wörld</p>"
        assert rows["http://a.com/1"]["charset"] == "utf-8"
        assert rows["http://a.com/1"]["status"] == 200
        assert rows["http://b.com/2"]["charset"] == "ISO-8859-1"
        assert rows["http://b.com/2"]["body"] == "<p>ascii only</p>"
        assert rows["http://b.com/2"]["content_length"] == len("<p>ascii only</p>")
        assert rows["http://c.com/3"]["charset"] is None
        assert rows["http://c.com/3"]["body"] == "<p>no label</p>"

    def test_latin1_body_bytes_on_disk(self, spark, tmp_path):
        """The writer must honor the row's declared charset when encoding."""
        df = spark.createDataFrame(
            [("http://x.com/1", "café", "text/plain; charset=ISO-8859-1")],
            "url string, body string, ct string",
        )
        warc.write_warc_responses(
            df, str(tmp_path), content_type_col="ct", compress=False
        )
        shard = next(n for n in os.listdir(tmp_path) if n.endswith(".warc"))
        raw = (tmp_path / shard).read_bytes()
        assert "café".encode("iso-8859-1") in raw
        assert "café".encode() not in raw
        back = warc.read_warc_responses(spark, str(tmp_path)).collect()
        assert back[0]["body"] == "café"

    def test_unencodable_body_is_loud(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("http://x.com/1", "日本語", "text/plain; charset=ISO-8859-1")],
            "url string, body string, ct string",
        )
        with pytest.raises(Exception, match="latin-1|encode"):
            warc.write_warc_responses(df, str(tmp_path), content_type_col="ct")

    def test_mixed_foreign_warc_only_responses(self, spark, tmp_path):
        blob = b"".join(
            [
                _record([("WARC-Type", "request")], b"GET / HTTP/1.1\r\n\r\n"),
                _record(
                    [
                        ("WARC-Type", "response"),
                        ("WARC-Target-URI", "http://f.com/x"),
                        ("WARC-Date", "2020-05-05T00:00:00Z"),
                        ("Content-Type", "application/http; msgtype=response"),
                    ],
                    b"HTTP/1.0 301 Moved\r\nLocation: http://f.com/y\r\n\r\ngone",
                ),
                _record(
                    [("WARC-Type", "conversion"), ("WARC-Target-URI", "http://f.com/x")],
                    b"extracted text",
                ),
            ]
        )
        (tmp_path / "crawl.warc").write_bytes(blob)
        got = warc.read_warc_responses(spark, str(tmp_path)).collect()
        assert len(got) == 1
        assert got[0]["status"] == 301
        assert got[0]["body"] == "gone"
        assert got[0]["warc_date"] == "2020-05-05T00:00:00Z"

    def test_null_rows_refused(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("http://a.com/1", None)], "url string, body string"
        )
        with pytest.raises(Exception, match="url and body"):
            warc.write_warc_responses(df, str(tmp_path))

    def test_empty_manifest_zero_rows(self, spark, tmp_path):
        warc.write_warc_responses(
            spark.createDataFrame([], "url string, body string"), str(tmp_path)
        )
        assert warc.read_warc_responses(spark, str(tmp_path)).count() == 0

    def test_files_override(self, spark, tmp_path):
        warc.write_warc_responses(
            self._df(spark).repartition(1), str(tmp_path), shard_records=1
        )
        shards = sorted(n for n in os.listdir(tmp_path) if n.endswith(".warc.gz"))
        assert len(shards) == 3
        got = warc.read_warc_responses(spark, str(tmp_path), files=shards[:2])
        assert got.count() == 2

    def test_html_to_text_pairing(self, spark, tmp_path):
        """The crawl→HTML→text pipeline composes on the body column."""
        from pyspark.sql import functions as F

        from xarray_beam_spark.functions.text import html_to_text

        df = spark.createDataFrame(
            [("http://a.com/1", "<html><body><p>one</p><p>two &amp; three</p></body></html>")],
            "url string, body string",
        )
        warc.write_warc_responses(df, str(tmp_path))
        back = warc.read_warc_responses(spark, str(tmp_path))
        out = back.select(html_to_text(F.col("body")).alias("t")).collect()
        assert out[0]["t"] == "one\ntwo & three"


class TestStreamingSinks:
    def test_wet_sink_appends_and_skips_replays(self, spark, tmp_path):
        import json as _json

        sink = warc.wet_stream_sink(str(tmp_path), shard_records=8)
        b0 = spark.createDataFrame(
            [("http://a/1", "one"), ("http://a/2", "two")],
            "url string, text string",
        )
        b1 = spark.createDataFrame([("http://a/3", "three")], "url string, text string")
        sink(b0, 0)
        sink(b1, 1)
        sink(b0, 0)  # replay: no-op
        got = sorted(
            (r["url"], r["text"]) for r in warc.read_wet(spark, str(tmp_path)).collect()
        )
        assert got == [("http://a/1", "one"), ("http://a/2", "two"), ("http://a/3", "three")]
        names = sorted(n for n in os.listdir(tmp_path) if n.endswith(".warc.wet.gz"))
        assert all(n.startswith("batch-") for n in names)
        meta = _json.loads((tmp_path / "_xbs_wet_meta.json").read_text())
        assert meta["shards"] == names

    def test_responses_sink_real_stream(self, spark, tmp_path):
        src_dir = tmp_path / "src"
        out = tmp_path / "out"
        spark.createDataFrame(
            [(f"http://s/{i}", f"<p>doc {i}</p>") for i in range(20)],
            "url string, body string",
        ).repartition(4).write.parquet(str(src_dir))
        src = (
            spark.readStream.schema("url string, body string")
            .option("maxFilesPerTrigger", "2")
            .parquet(str(src_dir))
        )
        q = (
            src.writeStream.foreachBatch(warc.warc_responses_stream_sink(str(out)))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        back = warc.read_warc_responses(spark, str(out))
        got = sorted(r["url"] for r in back.collect())
        assert got == sorted(f"http://s/{i}" for i in range(20))

    def test_merge_format_mismatch_is_loud(self, spark, tmp_path):
        warc.write_warc_responses(
            spark.createDataFrame([("http://a/1", "x")], "url string, body string"),
            str(tmp_path),
        )
        # WET append onto a response dir: different sidecar file, so it
        # must NOT merge; a same-file format clash must raise
        (tmp_path / "_xbs_wet_meta.json").write_text(
            '{"format": "xbs-warc-v1", "shards": []}'
        )
        df = spark.createDataFrame([("http://a/2", "y")], "url string, text string")
        with pytest.raises(Exception, match="format"):
            warc.write_wet(df, str(tmp_path), _merge_manifest=True)


class TestContentEncodingAndTruncation:
    def test_gzip_content_encoding_decoded(self):
        body = gzip.compress("compressed <p>page</p>".encode())
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + body
        )
        _, headers, out = warc.parse_http_response(payload)
        assert out == "compressed <p>page</p>".encode()

    def test_deflate_both_variants_decoded(self):
        import zlib

        raw = b"deflated body bytes"
        co = zlib.compressobj(wbits=-15)
        raw_deflate = co.compress(raw) + co.flush()
        for enc in (zlib.compress(raw), raw_deflate):
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + enc
            )
            _, _, out = warc.parse_http_response(payload)
            assert out == raw

    def test_chunked_then_gzip_layering(self):
        # TE comes off first, then CE (RFC 7230 §3.3)
        gz = gzip.compress(b"layered")
        chunked = (
            format(len(gz), "x").encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + chunked
        )
        _, _, out = warc.parse_http_response(payload)
        assert out == b"layered"

    def test_unsupported_content_encoding_is_loud(self):
        payload = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxxxx"
        with pytest.raises(ValueError, match="Content-Encoding"):
            warc.parse_http_response(payload)

    def test_marked_truncated_capture_yields_null_body(self, spark, tmp_path):
        """WARC-Truncated captures with an undecodable body surface as a
        row with NULL body; unmarked damage still fails the task."""
        gz = gzip.compress(b"x" * 1000)
        cut = gz[: len(gz) // 2]
        head = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        marked = _record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", "http://t.com/cut"),
                ("WARC-Truncated", "length"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            head + cut,
        )
        whole = _record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", "http://t.com/ok"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            b"HTTP/1.1 200 OK\r\n\r\nfine",
        )
        (tmp_path / "a.warc").write_bytes(marked + whole)
        rows = {
            r["url"]: r
            for r in warc.read_warc_responses(spark, str(tmp_path)).collect()
        }
        assert rows["http://t.com/cut"]["body"] is None
        assert rows["http://t.com/cut"]["truncated"] == "length"
        assert rows["http://t.com/ok"]["body"] == "fine"
        assert rows["http://t.com/ok"]["truncated"] is None

    def test_unmarked_damage_still_loud(self, spark, tmp_path):
        bad = _record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", "http://t.com/bad"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            b"HTTP/1.1 200 OK\r\nContent-Type: text/h",  # no blank line
        )
        (tmp_path / "a.warc").write_bytes(bad)
        with pytest.raises(Exception, match="truncated HTTP head"):
            warc.read_warc_responses(spark, str(tmp_path)).collect()


class TestHttpResponseProperty:
    """Encode→parse→decode totality over arbitrary bodies/charsets."""

    def test_roundtrip_property(self):
        from hypothesis import assume, given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            st.text(min_size=0, max_size=400),
            st.sampled_from(["utf-8", "ISO-8859-1", "windows-1252"]),
            st.booleans(),  # gzip content-coding
        )
        def prop(text, charset, gz):
            try:
                body = text.encode(charset)
            except UnicodeEncodeError:
                assume(False)
            # round-trip guard: cp1252 maps some bytes to the same chars
            assume(body.decode(charset, "strict") == text)
            wire = gzip.compress(body) if gz else body
            head = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset={charset}\r\n"
                + ("Content-Encoding: gzip\r\n" if gz else "")
                + "\r\n"
            ).encode("latin-1")
            status, headers, out = warc.parse_http_response(head + wire)
            assert status == 200 and out == body
            decoded, cs = warc.decode_http_body(out, headers["content-type"])
            assert decoded == text and cs == charset

        prop()


class TestReviewRegressions:
    """Round-12 review findings, pinned."""

    def test_truncated_deflate_capture_tolerated(self, spark, tmp_path):
        """zlib.error from a cut compressed body must count as the
        expected damage class for a WARC-Truncated capture (it is not a
        ValueError subclass and used to escape the tolerance handler)."""
        import hashlib
        import zlib

        # incompressible payload so the cut truly truncates the stream
        raw = b"".join(hashlib.md5(bytes([i])).digest() for i in range(200))
        full = zlib.compress(raw)
        assert len(full) > 1000
        cut = full[: len(full) // 2]
        head = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
        marked = _record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", "http://t.com/z"),
                ("WARC-Truncated", "length"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            head + cut,
        )
        (tmp_path / "a.warc").write_bytes(marked)
        rows = warc.read_warc_responses(spark, str(tmp_path)).collect()
        assert rows[0]["body"] is None and rows[0]["truncated"] == "length"

    def test_bytes_transform_charset_label_falls_back(self):
        """codecs.lookup resolves bytes↔bytes transforms (base64, hex,
        rot13); their .decode raises on str output — must fall back to
        utf-8, never kill the task."""
        for label in ("base64", "hex", "rot13", "zip"):
            text, cs = warc.decode_http_body(
                "safe".encode(), f"text/html; charset={label}"
            )
            assert text == "safe" and cs == label

    def test_crlf_in_content_type_is_loud(self, spark, tmp_path):
        """Per-row content types are crawl-derived data: a CR/LF inside
        one would end the framed HTTP head early (verified silent body
        corruption before the guard)."""
        df = spark.createDataFrame(
            [("http://a.com/1", "body", "text/html\r\n\r\nEVIL")],
            "url string, body string, ct string",
        )
        with pytest.raises(Exception, match="CR/LF"):
            warc.write_warc_responses(df, str(tmp_path), content_type_col="ct")


class TestParserFuzz:
    """Arbitrary/mutated bytes must parse or raise ValueError — never an
    IndexError/KeyError/zlib.error/hang (executor tasks turn anything
    else into an opaque task failure; ValueError is the loud contract)."""

    def test_random_bytes_total(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(min_size=0, max_size=400))
        def prop(buf):
            for fn in (warc.parse_warc, warc.parse_http_response):
                try:
                    fn(buf)
                except ValueError:
                    pass

        prop()

    def test_mutated_valid_records_total(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        rec = _record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", "http://f.com/x"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n",
        )

        @settings(max_examples=300, deadline=None)
        @given(
            st.integers(min_value=0, max_value=len(rec) - 1),
            st.integers(min_value=0, max_value=255),
        )
        def prop(pos, byte):
            mutated = rec[:pos] + bytes([byte]) + rec[pos + 1 :]
            try:
                out = warc.parse_warc(mutated)
                for r in out:
                    if r["headers"].get("warc-type") == "response":
                        warc.parse_http_response(r["payload"])
            except ValueError:
                pass

        prop()


def test_case_insensitive_http_content_type(spark, tmp_path):
    """Media types are case-insensitive (RFC 2045): an 'Application/HTTP'
    capture must not silently vanish from read_warc_responses."""
    rec = _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Target-URI", "http://c.com/x"),
            ("Content-Type", "Application/HTTP; msgtype=response"),
        ],
        b"HTTP/1.1 200 OK\r\n\r\nupper",
    )
    (tmp_path / "a.warc").write_bytes(rec)
    got = warc.read_warc_responses(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0]["body"] == "upper"


class TestBoundedBatches:
    """Rows exceeding ``batch_bytes`` must leave the read task as
    multiple RecordBatches (streaming gunzip + incremental framing +
    bounded flushes) and still round-trip exactly."""

    def test_wet_multiple_batches_per_shard_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.range(150).select(
            F.concat(F.lit("http://e.com/"), F.col("id").cast("string")).alias("url"),
            F.concat(F.lit("w" * 300), F.col("id").cast("string")).alias("text"),
        )
        warc.write_wet(df.repartition(1), str(tmp_path), shard_records=1000)
        back = warc.read_wet(spark, str(tmp_path), batch_bytes=1024)
        rows = {r["url"]: r["text"] for r in back.collect()}
        assert len(rows) == 150
        assert rows["http://e.com/3"] == "w" * 300 + "3"

    def test_responses_multiple_batches_per_shard_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = spark.range(80).select(
            F.concat(F.lit("http://e.com/p"), F.col("id").cast("string")).alias("url"),
            F.concat(F.lit("<p>"), F.col("id").cast("string"), F.lit("</p>" + "b" * 200)).alias("body"),
        )
        warc.write_warc_responses(df.repartition(1), str(tmp_path), shard_records=1000)
        back = warc.read_warc_responses(spark, str(tmp_path), batch_bytes=512)
        rows = {r["url"]: r for r in back.collect()}
        assert len(rows) == 80
        assert rows["http://e.com/p5"]["body"] == "<p>5</p>" + "b" * 200
        assert rows["http://e.com/p5"]["status"] == 200
