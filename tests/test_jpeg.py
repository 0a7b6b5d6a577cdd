"""From-spec baseline JPEG codec (sources/jpeg.py).

Validation strategy (no PIL/libjpeg in the container):
- encode→decode round-trips with PSNR/abs-error bounds (JPEG is lossy);
- a REAL libjpeg-encoded file from the CPython test suite (4:2:0,
  custom Huffman tables) decoded and compared against the same image's
  raw PPM — cross-validation against an independent encoder;
- constant-block images at quality 100 round-trip LOSSLESSLY (the
  property the multimodal gate's exact SQL oracle rests on);
- handcrafted golden streams for the restart-marker and progressive
  EOB-run paths, loud rejection of arithmetic/malformed streams;
- progressive (SOF2) decode pinned by bit-exact parity with the baseline
  decode of the same quantized coefficients (see TestProgressive).
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_beam_spark.sources import jpeg

# derived from the running interpreter's stdlib test package, not a
# hardcoded pyenv path: a Python patch bump must not silently skip the
# only cross-validation against a real libjpeg-encoded file
import os as _os
import test as _stdlib_test

_CPY_IMG = _os.path.join(_os.path.dirname(_stdlib_test.__file__), "imghdrdata")


def _test_image(h: int = 40, w: int = 56) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(yy / 7.0) + np.cos(xx / 9.0)) * 60 + 128).astype(np.uint8)


class TestRoundtrip:
    def test_grayscale(self):
        img = _test_image()
        back = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92, subsample=False))
        assert back.shape == img.shape and back.dtype == np.uint8
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 4

    def test_rgb_444(self):
        img = _test_image()
        rgb = np.stack([img, 255 - img, img // 2 + 64], axis=-1)
        back = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=95, subsample=False))
        assert back.shape == rgb.shape
        err = np.abs(back.astype(int) - rgb.astype(int))
        assert err.max() <= 8 and err.mean() < 2.0

    def test_rgb_420(self):
        img = _test_image()
        rgb = np.stack([img, 255 - img, img // 2 + 64], axis=-1)
        back = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=95, subsample=True))
        assert back.shape == rgb.shape
        # chroma is smooth here, so 2x2 subsampling stays tight
        err = np.abs(back.astype(int) - rgb.astype(int))
        assert err.mean() < 4.0, err.mean()

    def test_odd_dimensions(self):
        # non-multiple-of-8 (and of 16 for 4:2:0) extents exercise padding
        rng = np.random.default_rng(3)
        for h, w in [(1, 1), (7, 9), (17, 23), (8, 33)]:
            smooth = np.full((h, w), 100, np.uint8) + (
                rng.integers(0, 3, (h, w)).astype(np.uint8)
            )
            rgb = np.stack([smooth, smooth, smooth], axis=-1)
            for sub in (False, True):
                back = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=90, subsample=sub))
                assert back.shape == rgb.shape, (h, w, sub)

    def test_constant_blocks_lossless_at_q100(self):
        """Constant 8x8 blocks + quality 100 → bit-exact round-trip (the
        multimodal_jpeg_features oracle's foundation)."""
        vals = np.array([[0, 13], [255, 128]], np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        back = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100, subsample=False))
        np.testing.assert_array_equal(back, img)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.sampled_from([50, 85, 100]))
    def test_random_smooth_property(self, seed, quality):
        rng = np.random.default_rng(seed)
        base = rng.integers(40, 216, (4, 5)).astype(np.float64)
        img = np.clip(
            np.kron(base, np.ones((8, 8))) + rng.normal(0, 2, (32, 40)), 0, 255
        ).astype(np.uint8)
        back = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality, subsample=False))
        assert back.shape == img.shape
        tol = {50: 20, 85: 12, 100: 6}[quality]
        assert np.abs(back.astype(int) - img.astype(int)).mean() < tol


@pytest.mark.skipif(not os.path.isdir(_CPY_IMG), reason="CPython test images absent")
class TestRealLibjpegFile:
    """python.jpg (CPython test suite) is a real libjpeg-encoded baseline
    4:2:0 file with optimized (non-Annex-K) Huffman tables; python.ppm is
    the same image raw — an independent-encoder ground truth."""

    def _ground_truth(self) -> np.ndarray:
        raw = open(f"{_CPY_IMG}/python.ppm", "rb").read()
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", raw)
        w, h = int(m.group(1)), int(m.group(2))
        return np.frombuffer(raw[m.end():], dtype=np.uint8).reshape(h, w, 3)

    def test_decode_matches_ppm(self):
        dec = jpeg.decode_jpeg(open(f"{_CPY_IMG}/python.jpg", "rb").read())
        ref = self._ground_truth()
        assert dec.shape == ref.shape == (16, 16, 3)
        # luma must be tight (no subsampling loss); raw RGB is dominated
        # by the ENCODER's 4:2:0 chroma averaging on this sharp-edged icon
        def luma(a):
            return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

        dy = np.abs(luma(dec.astype(float)) - luma(ref.astype(float)))
        assert dy.mean() < 5.0 and dy.max() < 20.0, (dy.mean(), dy.max())
        assert np.abs(dec.astype(int) - ref.astype(int)).mean() < 12.0


class TestMarkers:
    def test_baseline_mislabeled_progressive_rejected(self):
        """A baseline stream with SOF0 flipped to SOF2 is MALFORMED
        progressive (its single scan declares Ss=0,Se=63 — illegal for a
        progressive DC scan) — loud ValueError, not garbage pixels."""
        blob = bytearray(jpeg.encode_jpeg(_test_image(), quality=90))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # flip SOF0 -> SOF2
        with pytest.raises(ValueError, match="Se=0"):
            jpeg.decode_jpeg(bytes(blob))

    def test_arithmetic_rejected_clearly(self):
        blob = bytearray(jpeg.encode_jpeg(_test_image(), quality=90))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC9
        with pytest.raises(ValueError, match="arithmetic"):
            jpeg.decode_jpeg(bytes(blob))

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")

    def test_restart_markers(self):
        """Handcrafted 2-MCU grayscale stream with DRI=1 and an RST0
        between the MCUs — the restart path resets DC predictors and
        byte-aligns (T.81 E.2.4)."""
        dc = jpeg._HuffTable(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
        ac = jpeg._HuffTable(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
        qtbl = np.ones(64, dtype=np.int64)

        def dc_only_block(diff: int) -> "jpeg._BitWriter":
            w = jpeg._BitWriter()
            s = abs(diff).bit_length()
            w.write(*dc.codes[s])
            if s:
                w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            w.write(*ac.codes[0x00])  # EOB
            return w

        v1, v2 = 136, 120  # DC coef = 8*(v-128)
        w1 = dc_only_block(8 * (v1 - 128))
        w1.flush()
        # predictor RESETS at the restart: second diff is from 0 again
        w2 = dc_only_block(8 * (v2 - 128))
        w2.flush()
        scan = bytes(w1.out) + b"\xff\xd0" + bytes(w2.out)

        out = bytearray(b"\xff\xd8")
        out += jpeg._dqt_segment(0, qtbl)
        sof = bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
        out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        out += jpeg._dht_segment(0, 0, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
        out += jpeg._dht_segment(1, 0, jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
        out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1 MCU
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
        out += scan + b"\xff\xd9"

        img = jpeg.decode_jpeg(bytes(out))
        assert img.shape == (8, 16)
        assert (img[:, :8] == v1).all() and (img[:, 8:] == v2).all()


class TestRobustness:
    @settings(max_examples=120, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_corrupted_streams_never_leak_internal_errors(self, seed):
        """Failure contract: arbitrary byte corruption yields either a
        decoded image or ValueError — never IndexError / StopIteration /
        OverflowError / struct.error / a hang."""
        rng = np.random.default_rng(seed)
        img = ((np.arange(1024) % 251).reshape(32, 32)).astype(np.uint8)
        blob = bytearray(jpeg.encode_jpeg(img, quality=80))
        for _ in range(int(rng.integers(1, 6))):
            blob[int(rng.integers(2, len(blob)))] = int(rng.integers(0, 256))
        try:
            out = jpeg.decode_jpeg(bytes(blob))
            assert out.dtype == np.uint8
        except ValueError:
            pass

    def test_zero_sampling_factor_is_valueerror(self):
        """Hypothesis seed 2640030283 (round-6 falsifier): a corrupt SOF whose
        sampling-factor nibbles are 0 must raise ValueError, not reach the
        MCU math and leak ZeroDivisionError."""
        blob = bytearray(jpeg.encode_jpeg(np.zeros((16, 16), np.uint8)))
        i = blob.find(b"\xff\xc0")
        blob[i + 11] = 0x00  # component 0 h=v=0
        with pytest.raises(ValueError, match="sampling factors"):
            jpeg.decode_jpeg(bytes(blob))
        blob[i + 11] = 0x50  # h=5 (>4) also out of range per T.81 B.2.2
        with pytest.raises(ValueError, match="sampling factors"):
            jpeg.decode_jpeg(bytes(blob))

    def test_decompression_bomb_guard(self):
        blob = bytearray(jpeg.encode_jpeg(np.zeros((8, 8), np.uint8)))
        i = blob.find(b"\xff\xc0")
        blob[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)  # 4.3 GP
        with pytest.raises(ValueError, match="pixel guard"):
            jpeg.decode_jpeg(bytes(blob))

    def test_truncated_stream(self):
        blob = jpeg.encode_jpeg(np.full((24, 24), 99, np.uint8), quality=90)
        for cut in (4, len(blob) // 2, len(blob) - 3):
            try:
                jpeg.decode_jpeg(blob[:cut])
            except ValueError:
                pass  # either outcome is within contract


class TestEncoderValidation:
    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="uint8"):
            jpeg.encode_jpeg(np.zeros((8, 8), np.float64))
        with pytest.raises(ValueError, match="expected"):
            jpeg.encode_jpeg(np.zeros((8, 8, 4), np.uint8))
        with pytest.raises(ValueError, match="empty"):
            jpeg.encode_jpeg(np.zeros((0, 8), np.uint8))

    def test_stream_is_wellformed(self):
        blob = jpeg.encode_jpeg(_test_image(), quality=85)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        # no bare 0xFF inside the entropy-coded data (byte stuffing)
        sos = blob.find(b"\xff\xda")
        scan = blob[sos + 2 + struct.unpack(">H", blob[sos + 2 : sos + 4])[0] : -2]
        i = 0
        while i < len(scan):
            if scan[i] == 0xFF:
                assert scan[i + 1] == 0x00, f"unstuffed FF at {i}"
                i += 2
            else:
                i += 1


class TestProgressive:
    """SOF2 decode (VERDICT r7 'What's missing' #1): spectral selection +
    successive approximation, validated three ways — bit-exact parity
    with the baseline decode of the SAME quantized coefficients, a
    handcrafted golden stream exercising EOB runs > 1 (which the
    standard-table encoder cannot emit), and corruption fuzzing."""

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_parity_with_baseline(self, seed):
        """encode_jpeg and encode_jpeg_progressive serialize identical
        quantized coefficients, so the decodes must be bit-identical —
        any progressive entropy bug shows up as a pixel diff or a raise."""
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        color = bool(rng.integers(0, 2))
        shape = (h, w, 3) if color else (h, w)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        q = int(rng.integers(5, 101))
        sub = bool(rng.integers(0, 2)) and color
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, subsample=sub))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=q, subsample=sub))
        np.testing.assert_array_equal(base, prog)

    def test_constant_blocks_lossless_q100(self):
        """The multimodal gate's losslessness family holds for the
        progressive stream too: constant 8x8 blocks at quality 100."""
        img = np.empty((16, 16), np.uint8)
        img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 7, 99, 200, 255
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=100, subsample=False))
        np.testing.assert_array_equal(out, img)

    def test_real_image_progressive_psnr(self):
        """python.jpg's pixels re-encoded progressively decode identically
        to the baseline re-encode (both 4:2:0)."""
        if not os.path.exists(f"{_CPY_IMG}/python.jpg"):
            pytest.skip("CPython test images not present")
        ref = jpeg.decode_jpeg(open(f"{_CPY_IMG}/python.jpg", "rb").read())
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(ref, quality=85, subsample=True))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(ref, quality=85, subsample=True))
        np.testing.assert_array_equal(base, prog)

    def test_golden_eobrun_stream(self):
        """Handcrafted 3-block grayscale progressive stream with EOB runs
        of 2 (symbol 0x10 + length bit) in BOTH the AC-first and
        AC-refine scans — standard Annex K tables lack the run symbols,
        so this is the only way to pin the eobrun > 1 decode paths.
        Expected pixels computed straight from the target coefficient
        state via the module's own IDCT (independent of the encoder)."""
        from xarray_beam_spark.sources.jpeg import ZIGZAG, _BitWriter, _HuffTable, _dht_segment, _dqt_segment, _idct2_batch

        dc_tbl = _HuffTable([0, 3] + [0] * 14, [0, 2, 5])
        ac_tbl = _HuffTable([0, 3] + [0] * 14, [0x00, 0x01, 0x10])
        out = bytearray(b"\xff\xd8")
        out += _dqt_segment(0, np.ones(64, np.int64))
        sof = bytes([8]) + struct.pack(">HH", 8, 24) + bytes([1, 1, 0x11, 0])
        out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
        out += _dht_segment(0, 0, dc_tbl.bits, dc_tbl.vals)
        out += _dht_segment(1, 0, ac_tbl.bits, ac_tbl.vals)

        def sos(ss, se, ah, al):
            seg = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
            return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

        # scan 1: DC first (Al=0) — diffs +2, 0, -2 -> DCs [2, 2, 0]
        w = _BitWriter()
        w.write(*dc_tbl.codes[2]); w.write(2, 2)   # +2
        w.write(*dc_tbl.codes[0])                  # 0
        w.write(*dc_tbl.codes[2]); w.write(1, 2)   # -2 (one's complement)
        w.flush()
        out += sos(0, 0, 0, 0) + w.out

        # scan 2: AC first (Al=1) — blk0 k1 := +1<<1 = 2, then EOBRUN=2
        # (symbol 0x10, extra bit 1) covering blocks 1 and 2 entirely
        w = _BitWriter()
        w.write(*ac_tbl.codes[0x01]); w.write(1, 1)  # r=0,s=1, value +1
        w.write(*ac_tbl.codes[0x10]); w.write(1, 1)  # EOBRUN = (1<<1)-1+1 = 2
        w.flush()
        out += sos(1, 63, 0, 1) + w.out

        # scan 3: AC refine (Ah=1, Al=0) — EOBRUN=2 (0x10, extra bit 0)
        # covers blocks 0 and 1; blk0's old-nonzero k1 takes a correction
        # bit (1 -> 2 becomes 3); blk2 gets a new +1 at k1 then EOB(1)
        w = _BitWriter()
        w.write(*ac_tbl.codes[0x10]); w.write(0, 1)  # EOBRUN = (1<<1)+0 = 2
        w.write(1, 1)                                # correction bit for blk0 k1
        w.write(*ac_tbl.codes[0x01]); w.write(1, 1)  # blk2: new +1 at k1
        w.write(*ac_tbl.codes[0x00])                 # EOB(1)
        w.flush()
        out += sos(1, 63, 1, 0) + w.out
        out += b"\xff\xd9"

        got = jpeg.decode_jpeg(bytes(out))
        # expected: zigzag coefficient state -> IDCT + 128
        zz = np.zeros((3, 64), np.int64)
        zz[0, 0], zz[0, 1] = 2, 3
        zz[1, 0] = 2
        zz[2, 1] = 1
        raster = np.zeros((3, 64))
        raster[:, ZIGZAG] = zz
        want = np.clip(np.round(_idct2_batch(raster.reshape(3, 8, 8)) + 128.0), 0, 255).astype(np.uint8)
        assert got.shape == (8, 24)
        for b in range(3):
            np.testing.assert_array_equal(got[:, b * 8 : (b + 1) * 8], want[b])

    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_corrupted_progressive_never_leaks_internal_errors(self, seed):
        """The baseline failure contract extended to progressive streams:
        byte corruption anywhere (headers, scan scripts, entropy data)
        yields a decoded image or ValueError, never an internal error."""
        rng = np.random.default_rng(seed)
        img = ((np.arange(1024) % 251).reshape(32, 32)).astype(np.uint8)
        blob = bytearray(jpeg.encode_jpeg_progressive(img, quality=80))
        for _ in range(int(rng.integers(1, 6))):
            blob[int(rng.integers(2, len(blob)))] = int(rng.integers(0, 256))
        try:
            out = jpeg.decode_jpeg(bytes(blob))
            assert out.dtype == np.uint8
        except ValueError:
            pass

    def test_progressive_restart_markers(self):
        """Handcrafted progressive stream with DRI=1 and RST markers in
        BOTH a DC scan (predictor reset) and an AC scan (EOB-run reset +
        byte realign) — the restart path the progressive encoder never
        emits."""
        from xarray_beam_spark.sources.jpeg import ZIGZAG, _BitWriter, _HuffTable, _dht_segment, _dqt_segment, _idct2_batch

        dc_tbl = _HuffTable([0, 3] + [0] * 14, [0, 2, 5])
        ac_tbl = _HuffTable([0, 3] + [0] * 14, [0x00, 0x01, 0x10])
        out = bytearray(b"\xff\xd8")
        out += _dqt_segment(0, np.ones(64, np.int64))
        sof = bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
        out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
        out += _dht_segment(0, 0, dc_tbl.bits, dc_tbl.vals)
        out += _dht_segment(1, 0, ac_tbl.bits, ac_tbl.vals)
        out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1

        def sos(ss, se, ah, al):
            seg = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
            return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

        # DC first: blk0 diff +2; RST0; blk1 diff +3 from a RESET predictor
        w = _BitWriter(); w.write(*dc_tbl.codes[2]); w.write(2, 2); w.flush()
        part0 = bytes(w.out)
        w = _BitWriter(); w.write(*dc_tbl.codes[2]); w.write(3, 2); w.flush()
        out += sos(0, 0, 0, 0) + part0 + b"\xff\xd0" + bytes(w.out)

        # AC first (Al=0): blk0 k1=+1 then EOB; RST1; blk1 k1=-1 then EOB
        w = _BitWriter()
        w.write(*ac_tbl.codes[0x01]); w.write(1, 1); w.write(*ac_tbl.codes[0x00]); w.flush()
        part0 = bytes(w.out)
        w = _BitWriter()
        w.write(*ac_tbl.codes[0x01]); w.write(0, 1); w.write(*ac_tbl.codes[0x00]); w.flush()
        out += sos(1, 63, 0, 0) + part0 + b"\xff\xd1" + bytes(w.out)
        out += b"\xff\xd9"

        got = jpeg.decode_jpeg(bytes(out))
        zz = np.zeros((2, 64), np.int64)
        zz[0, 0], zz[0, 1] = 2, 1   # DC 2, AC k1 +1
        zz[1, 0], zz[1, 1] = 3, -1  # predictor reset -> DC 3; AC k1 -1
        raster = np.zeros((2, 64))
        raster[:, ZIGZAG] = zz
        want = np.clip(np.round(_idct2_batch(raster.reshape(2, 8, 8)) + 128.0), 0, 255).astype(np.uint8)
        assert got.shape == (8, 16)
        np.testing.assert_array_equal(got[:, :8], want[0])
        np.testing.assert_array_equal(got[:, 8:], want[1])
