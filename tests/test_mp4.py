"""From-spec ISO BMFF (MP4) muxer/demuxer + the MJPEG video column.

Same strategy as the other from-spec codecs (png/jpeg/wav/gif/netcdf3):
hand-derived structural goldens, round-trips through our own encoder,
corruption loudness, and foreign-layout coverage (multi-chunk stsc runs,
co64 offsets, largesize boxes) that our writer never emits but real
exporters do.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xarray_beam_spark.sources import mp4
from xarray_beam_spark.sources.jpeg import encode_jpeg


def _jpeg_frames(vals):
    return [
        encode_jpeg(np.full((16, 16), v, np.uint8), quality=100, subsample=False)
        for v in vals
    ]


class TestMux:
    def test_structure_and_determinism(self):
        frames = _jpeg_frames([10, 20])
        buf = mp4.mux_mjpeg(frames, 16, 16, fps=25)
        assert buf[4:8] == b"ftyp"
        assert buf == mp4.mux_mjpeg(frames, 16, 16, fps=25)
        # sample data verbatim inside mdat at the stco offset
        info = mp4.demux_video(buf)
        off0, size0, _ = info["samples"][0]
        assert buf[off0 : off0 + size0] == frames[0]

    def test_empty_and_bad_fps_are_loud(self):
        with pytest.raises(ValueError, match="at least one frame"):
            mp4.mux_mjpeg([], 16, 16)
        with pytest.raises(ValueError, match="not divisible"):
            mp4.mux_mjpeg(_jpeg_frames([1]), 16, 16, fps=7)


class TestDemux:
    def test_roundtrip_samples_and_timing(self):
        frames = _jpeg_frames([10, 20, 30, 40])
        buf = mp4.mux_mjpeg(frames, 16, 16, fps=25, timescale=1000)
        info = mp4.demux_video(buf)
        assert info["codec"] == "jpeg" and info["timescale"] == 1000
        assert [d for _, _, d in info["samples"]] == [0, 40, 80, 120]
        got = [bytes(buf[o : o + s]) for o, s, _ in info["samples"]]
        assert got == frames

    def test_decode_frames_lossless_constant_blocks(self):
        frames = _jpeg_frames([7, 200])
        buf = mp4.mux_mjpeg(frames, 16, 16)
        out = mp4.extract_frames(buf)
        imgs = [mp4.decode_frame("jpeg", s) for _, s in out]
        assert imgs[0][3, 3] == 7 and imgs[1][9, 9] == 200

    def test_every_k_and_max_frames(self):
        buf = mp4.mux_mjpeg(_jpeg_frames([1, 2, 3, 4, 5]), 16, 16)
        assert [d for d, _ in mp4.extract_frames(buf, every_k=2)] == [0, 80, 160]
        assert len(mp4.extract_frames(buf, max_frames=2)) == 2
        with pytest.raises(ValueError, match="every_k"):
            mp4.extract_frames(buf, every_k=0)

    def test_multi_chunk_stsc_and_co64(self):
        """Foreign layout our writer never emits: 2 chunks with different
        samples_per_chunk (stsc runs) and 64-bit co64 offsets."""
        frames = [b"AAAA", b"BB", b"CCCCCC"]  # codec-agnostic extraction
        data = b"".join(frames)
        # layout: chunk1 = samples 1-2 at off 1000, chunk2 = sample 3
        base = bytearray(2000)
        base[1000 : 1000 + 6] = frames[0] + frames[1]
        base[1500 : 1500 + 6] = frames[2]

        def full(typ, payload, version=0, flags=0):
            return (
                struct.pack(">I", 12 + len(payload))
                + typ
                + struct.pack(">I", (version << 24) | flags)
                + payload
            )

        def box(typ, payload):
            return struct.pack(">I", 8 + len(payload)) + typ + payload

        entry = box(b"avc1", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
        stsd = full(b"stsd", struct.pack(">I", 1) + entry)
        stts = full(b"stts", struct.pack(">III", 1, 3, 100))
        stsc = full(
            b"stsc",
            struct.pack(">I", 2)
            + struct.pack(">III", 1, 2, 1)
            + struct.pack(">III", 2, 1, 1),
        )
        stsz = full(b"stsz", struct.pack(">II", 0, 3) + struct.pack(">III", 4, 2, 6))
        co64 = full(b"co64", struct.pack(">I", 2) + struct.pack(">QQ", 1000, 1500))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + co64)
        minf = box(b"minf", stbl)
        mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 600, 300, 0x55C4, 0))
        hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", trak)
        buf = bytes(moov) + bytes(base[len(moov) :])
        # rebuild with moov at front; offsets 1000/1500 must stay valid
        assert len(moov) < 1000
        info = mp4.demux_video(buf)
        assert info["codec"] == "avc1" and info["timescale"] == 600
        got = [bytes(buf[o : o + s]) for o, s, _ in info["samples"]]
        assert got == frames
        assert [d for _, _, d in info["samples"]] == [0, 100, 200]
        # sample extraction works; avc1 DECODE refuses honestly
        with pytest.raises(NotImplementedError, match="avc1"):
            mp4.decode_frame("avc1", got[0])

    def test_corruption_is_loud(self):
        buf = bytearray(mp4.mux_mjpeg(_jpeg_frames([5]), 16, 16))
        with pytest.raises(ValueError, match="no moov"):
            mp4.demux_video(b"\x00\x00\x00\x08free")
        # truncate mid-moov: some box overruns its parent or header
        with pytest.raises(ValueError):
            mp4.demux_video(bytes(buf[: len(buf) // 2]))
        # a sample overrunning the file
        i = bytes(buf).find(b"stsz")
        sz = bytearray(buf)
        sz[i + 12 + 4 : i + 12 + 8] = struct.pack(">I", 1 << 30)  # first size
        with pytest.raises(ValueError, match="overruns the file"):
            mp4.demux_video(bytes(sz))

    def test_largesize_box(self):
        buf = bytearray(mp4.mux_mjpeg(_jpeg_frames([5]), 16, 16))
        # rewrite mdat as a size==1 largesize box (adds 8 bytes; moov
        # offsets still point correctly because mdat is LAST and stco
        # points into it... so instead wrap a free box before ftyp? no:
        # simply verify the box walker itself handles largesize)
        i = bytes(buf).find(b"mdat") - 4
        (size,) = struct.unpack_from(">I", buf, i)
        large = (
            struct.pack(">I", 1)
            + b"mdat"
            + struct.pack(">Q", size + 8)
            + bytes(buf[i + 8 : i + size])
        )
        boxes = list(mp4._iter_boxes(bytes(buf[:i]) + large, 0, i + len(large)))
        assert [t for t, _, _ in boxes] == [b"ftyp", b"moov", b"mdat"]


class TestVideoColumn:
    def test_decode_video_mp4_branch(self):
        from xarray_beam_spark.operators.multimodal import decode_video

        buf = mp4.mux_mjpeg(_jpeg_frames([11, 22, 33]), 16, 16)
        arr = decode_video(buf)
        assert arr.shape == (3, 16, 16, 3)
        assert arr[0, 0, 0, 0] == 11 and arr[2, 5, 5, 1] == 33

    def test_mp4_frame_features_spark(self, spark):
        from xarray_beam_spark.operators.multimodal import (
            documents_as_mp4_assets,
            mp4_frame_features,
        )

        docs = spark.createDataFrame(
            [(0, "abcdefgh"), (1, "zz")], "doc_id long, text string"
        )
        assets = documents_as_mp4_assets(docs)
        rows = {
            (r["asset_id"], r["frame_idx"]): r
            for r in mp4_frame_features(assets).collect()
        }
        # doc 0: 2 frames; doc 1: 3 frames (2 + doc_id % 3)
        assert len(rows) == 5
        r = rows[(0, 0)]
        want = sum(ord(c) for c in "abcd") / 4.0
        assert r["mean_px"] == want and r["pts_ms"] == 0
        assert rows[(0, 1)]["pts_ms"] == 40
        assert rows[(1, 2)]["mean_px"] == float(ord("z"))

    def test_every_k_sampling_spark(self, spark):
        from xarray_beam_spark.operators.multimodal import (
            documents_as_mp4_assets,
            mp4_frame_features,
        )

        docs = spark.createDataFrame([(2, "qqqq")], "doc_id long, text string")
        assets = documents_as_mp4_assets(docs)  # 2 + 2%3 = 4 frames
        out = mp4_frame_features(assets, every_k=2).collect()
        assert sorted(r["frame_idx"] for r in out) == [0, 2]
        assert sorted(r["pts_ms"] for r in out) == [0, 80]


class TestDemuxFuzz:
    """Totality parity with the WARC/HTTP parsers (tests/test_warc.py
    TestParserFuzz): arbitrary bytes and mutated/truncated valid files
    must demux or raise ValueError/NotImplementedError — never leak an
    IndexError/struct.error/MemoryError or hang. A box-tree parser on
    foreign training data sees garbage at scale; executor tasks turn
    anything but the loud contract into an opaque task failure."""

    @staticmethod
    def _total(buf):
        try:
            info = mp4.demux_video(bytes(buf))
        except (ValueError, NotImplementedError):
            return
        # a successful parse must also be SAFE to consume: every sample
        # maps to real file bytes and frame extraction stays in bounds
        assert isinstance(info["timescale"], int)
        for off, size, dts in info["samples"]:
            assert 0 <= off and off + size <= len(buf)
        try:
            mp4.extract_frames(bytes(buf), every_k=2, info=info)
        except (ValueError, NotImplementedError):
            pass

    def test_random_bytes_total(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(min_size=0, max_size=600))
        def prop(buf):
            self._total(buf)

        prop()

    def test_mutated_valid_file_total(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        base = mp4.mux_mjpeg(_jpeg_frames([7, 9]), 16, 16)

        @settings(max_examples=300, deadline=None)
        @given(
            st.integers(min_value=0, max_value=len(base) - 1),
            st.integers(min_value=0, max_value=255),
        )
        def prop(pos, byte):
            self._total(base[:pos] + bytes([byte]) + base[pos + 1 :])

        prop()

    def test_truncations_total(self):
        base = mp4.mux_mjpeg(_jpeg_frames([7, 9]), 16, 16)
        for cut in range(0, len(base), 7):
            self._total(base[:cut])

    def test_const_size_stsz_bomb_is_loud(self):
        """A 16-byte constant-size stsz declaring 2^31 samples must raise
        before allocating the per-sample lists (regression: the const
        branch built [size]*n with no bound against the file length)."""
        buf = bytearray(mp4.mux_mjpeg(_jpeg_frames([5]), 16, 16))
        i = bytes(buf).index(b"stsz")
        # stsz payload: version/flags, sample_size, sample_count
        struct.pack_into(">II", buf, i + 8, 100, 2**31)
        with pytest.raises(ValueError, match="more than the file holds"):
            mp4.demux_video(bytes(buf))

    def test_quadratic_stsc_walk_is_linear(self):
        """Many-run stsc + many-chunk stco must demux in ~linear time
        (regression: the per-chunk run rescan was O(chunks x runs))."""
        import time

        # valid single-sample movie, then graft a big stsc/stco pair of
        # matching, structurally consistent runs (1 sample per chunk)
        n = 4000
        frames = _jpeg_frames([3])
        sample = frames[0]
        runs = b"".join(struct.pack(">III", k + 1, 1, 1) for k in range(n))
        stsc = struct.pack(">I", 0) + struct.pack(">I", n) + runs
        # every chunk points at the one real sample's offset
        base = mp4.mux_mjpeg(frames, 16, 16)
        off = base.index(sample)
        stco = (
            struct.pack(">I", 0)
            + struct.pack(">I", n)
            + struct.pack(">I", off) * n
        )
        stsz = struct.pack(">I", 0) + struct.pack(">II", len(sample), n)
        stts = struct.pack(">I", 0) + struct.pack(">III", 1, n, 40)

        def full(typ, payload):
            return struct.pack(">I", 8 + len(payload)) + typ + payload

        # rebuild the stbl with the grafted tables via the public muxer's
        # box layout: simplest is to demux-fail fast if structure is off
        i = base.index(b"stbl")
        # splice: replace the whole original stbl box with ours
        (stbl_size,) = struct.unpack_from(">I", base, i - 4)
        stsd_start = base.index(b"stsd") - 4
        stsd_size = struct.unpack_from(">I", base, stsd_start)[0]
        stsd = base[stsd_start : stsd_start + stsd_size]
        new_stbl_payload = (
            stsd
            + full(b"stts", stts)
            + full(b"stsc", stsc)
            + full(b"stsz", stsz)
            + full(b"stco", stco)
        )
        new_stbl = full(b"stbl", new_stbl_payload)
        # chunks overlap (all point at the one real sample), so pad the
        # file with a top-level free box until the n*const_size declared
        # sample bytes fit — the anti-bomb bound checks the total
        pad = full(b"free", b"\x00" * (n * len(sample)))
        patched = base[: i - 4] + new_stbl + base[i - 4 + stbl_size :] + pad
        # fix every ancestor box size (moov/trak/mdia/minf grew)
        delta = len(new_stbl) - stbl_size
        out = bytearray(patched)
        for anc in (b"moov", b"trak", b"mdia", b"minf"):
            j = out.index(anc) - 4
            (sz,) = struct.unpack_from(">I", out, j)
            struct.pack_into(">I", out, j, sz + delta)
        t0 = time.perf_counter()
        info = mp4.demux_video(bytes(out))
        dt = time.perf_counter() - t0
        assert len(info["samples"]) == n
        assert dt < 2.0  # quadratic rescan took >>10s at this size
