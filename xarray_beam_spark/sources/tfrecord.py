"""From-spec TFRecord container + ``tf.train.Example`` codec, Spark-first.

The reference (xarray-beam) has no TFRecord surface; this module is part
of the training-data-pipeline extension (same tier as
``operators/corpus.py``): TFRecord files of ``tf.train.Example`` protos
are the canonical export format LLM/seq2seq training jobs consume
(T5/BERT/NeoX input pipelines), so a corpus engine that cannot emit them
stops one step short of the trainer.

No TensorFlow in this container (and none needed): both layers are tiny
PUBLIC specs implemented from scratch —

* TFRecord framing (tensorflow ``core/lib/io/record_writer.cc``):
  ``uint64le length | uint32le masked_crc32c(length) | data |
  uint32le masked_crc32c(data)``, where
  ``mask(crc) = ((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32``.
  The crc is CRC-32C (Castagnoli) — same polynomial the Zarr v3 shard
  index uses (``zarrlite._crc32c``).
* ``tf.train.Example`` (tensorflow ``core/example/{example,feature}.proto``):
  ``Example{ Features{ map<string, Feature> } }`` with
  ``Feature = oneof{ BytesList=1, FloatList=2, Int64List=3 }`` — encoded
  with a from-scratch protobuf wire codec (varint / length-delimited;
  packed and unpacked repeated numerics both accepted on read, packed
  written, unknown fields skipped).

Scale shape: the writer is ``mapInArrow`` — every input partition
serializes its own rows and puts one shard object per ``shard_records``
slice through the ``stores`` backend (local fs / http / mem), so the
write is embarrassingly parallel with zero shuffle and no driver
participation beyond a one-blob schema sidecar. The reader inverts it:
shard keys are listed once, parallelized, and each task decodes only its
shard. Arrow (not pandas) on both legs is load-bearing for correctness:
pandas represents a null-bearing int64 column as float64, which silently
rounds values above 2^53 (hashes, fingerprints) — Arrow's ``to_pylist``
preserves int64 exactly and keeps NULL (→ missing feature) distinct
from a genuine float NaN (→ a FloatList holding NaN). CRCs are verified
on every read; a flipped bit fails loudly, never decodes garbage.
Determinism: feature keys are written sorted, so equal rows produce
identical bytes (needed for the driver's hash gate and for idempotent
task retries — a re-written shard is byte-identical).

Precision note (spec, not implementation): ``FloatList`` carries
float32. Double columns are demoted on write and come back as float32
values; exact round-trips need string/binary/integer columns. The writer
refuses double columns unless ``allow_f32_demotion=True`` so the loss is
always opt-in.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from xarray_beam_spark.sources import bytestream, stores
from xarray_beam_spark.sources.zarrlite import _crc32c, _crc32c_table

_MASK_DELTA = 0xA282EAD8
_META_NAME = "_xbs_tfrecord_meta.json"


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# batched CRC-32C
#
# The crc recurrence is sequential in the byte index, so one buffer can't
# vectorize — but a batch can: one numpy gather per byte position over
# every record still in range (iterations = max length, vector work =
# records). Two shapes need care:
#   * heterogeneous lengths — a dense (n, max_len) pad matrix costs
#     n*max, not sum(len); records are length-sorted and processed in
#     groups whose padded size stays under _PAD_CAP, so one big record
#     never multiplies against the batch count;
#   * a single long record — reshaped into equal _SEG_LEN segments
#     (vector work = segments, iterations = _SEG_LEN) whose CRCs fold
#     together with the GF(2) zero-advance operator (the crc32_combine
#     construction from zlib: appending n zero *bits* to a message is a
#     linear map on the crc register, so M^(8·len) composes segment CRCs
#     in O(1) per segment after one cached matrix build).

_TABLE_NP: np.ndarray | None = None
_POLY_REFLECTED = 0x82F63B78
_PAD_CAP = 1 << 24   # max padded bytes per vectorized group (16 MB)
_SEG_LEN = 1 << 12   # segment length for long-record reshaping (4 KB)
_LONG_LEN = 1 << 16  # records above this reshape+fold instead of padding
                     # (a lone long record in a pad group would serialize
                     # the whole byte loop at vector width 1)


def _gf2_times(mat: list[int], vec: int) -> int:
    out = 0
    i = 0
    while vec:
        if vec & 1:
            out ^= mat[i]
        vec >>= 1
        i += 1
    return out


def _gf2_square(mat: list[int]) -> list[int]:
    return [_gf2_times(mat, m) for m in mat]


def _one_bit_op() -> list[int]:
    # operator advancing the (reflected) crc register by one zero bit
    return [_POLY_REFLECTED] + [1 << n for n in range(31)]


_ZERO_OPS: dict[int, list[int]] = {}


def _zero_advance_op(nbits: int) -> list[int]:
    """Matrix advancing a crc over ``nbits`` zero bits (nbits = power of 2)."""
    op = _ZERO_OPS.get(nbits)
    if op is None:
        assert nbits and nbits & (nbits - 1) == 0, nbits
        op = _one_bit_op()
        k = nbits.bit_length() - 1
        for _ in range(k):
            op = _gf2_square(op)
        _ZERO_OPS[nbits] = op
    return op


def crc32c_combine(crc1: int, crc2: int, len2: int) -> int:
    """crc of A||B from crc(A), crc(B), len(B) — zlib's crc32_combine
    construction with the Castagnoli polynomial."""
    if len2 == 0:
        return crc1
    odd = _gf2_square(_gf2_square(_one_bit_op()))  # 4 zero bits
    while True:
        even = _gf2_square(odd)  # first pass: 8 bits = 1 zero byte
        if len2 & 1:
            crc1 = _gf2_times(even, crc1)
        len2 >>= 1
        if not len2:
            break
        odd = _gf2_square(even)
        if len2 & 1:
            crc1 = _gf2_times(odd, crc1)
        len2 >>= 1
        if not len2:
            break
    return crc1 ^ crc2


_TABLES8: np.ndarray | None = None


def _tables8() -> np.ndarray:
    """Slicing-by-8 tables: T[0] is the byte table; T[k][b] advances
    T[k-1][b] through one more zero byte. Processing 8 input bytes per
    step cuts the python-level loop count 8x."""
    global _TABLES8, _TABLE_NP
    if _TABLES8 is None:
        if _TABLE_NP is None:
            _TABLE_NP = np.asarray(_crc32c_table(), dtype=np.uint32)
        t = np.empty((8, 256), np.uint32)
        t[0] = _TABLE_NP
        for k in range(1, 8):
            t[k] = _TABLE_NP[t[k - 1] & 0xFF] ^ (t[k - 1] >> 8)
        _TABLES8 = t
    return _TABLES8


def _crc32c_matrix(bufs: list[bytes], lens: np.ndarray) -> np.ndarray:
    """Core vectorized pass: caller guarantees the padded matrix is small
    and ``lens`` sorted ascending (finished records form a prefix)."""
    t8 = _tables8()
    t0, t1, t2, t3, t4, t5, t6, t7 = (t8[k] for k in range(8))
    n = len(bufs)
    maxlen = int(lens.max(initial=0))
    nblk = maxlen // 8
    mat = np.zeros((n, maxlen), np.uint8)
    for i, b in enumerate(bufs):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
    crc = np.full(n, 0xFFFFFFFF, np.uint32)
    full = lens // 8  # number of complete blocks per record
    # phase 1: slicing-by-8 over each record's 8-byte-aligned prefix;
    # blocks are read as little-endian uint64 (one strided gather +
    # shifts — measurably faster than a (n, 8) byte slice + cast)
    start = 0
    if nblk:
        m64 = mat[:, : nblk * 8].view("<u8").reshape(n, nblk)
        for j in range(nblk):
            while start < n and full[start] <= j:
                start += 1
            d = m64[start:, j]
            c = crc[start:] ^ (d & 0xFFFFFFFF).astype(np.uint32)
            hi = (d >> 32).astype(np.uint32)
            crc[start:] = (
                t7[c & 0xFF]
                ^ t6[(c >> 8) & 0xFF]
                ^ t5[(c >> 16) & 0xFF]
                ^ t4[c >> 24]
                ^ t3[hi & 0xFF]
                ^ t2[(hi >> 8) & 0xFF]
                ^ t1[(hi >> 16) & 0xFF]
                ^ t0[hi >> 24]
            )
    # phase 2: per-record tails (< 8 bytes), per-byte at per-record offsets
    base = (full * 8).astype(np.int64)
    tail = lens - base
    for t in range(7):
        rows = np.nonzero(tail > t)[0]
        if rows.size == 0:
            break
        c = crc[rows]
        b = mat[rows, base[rows] + t]
        crc[rows] = t0[(c ^ b) & 0xFF] ^ (c >> 8)
    return crc ^ np.uint32(0xFFFFFFFF)


def _crc32c_long(buf: bytes) -> int:
    """Long record: equal segments vectorize, zero-advance folds them."""
    segs = [buf[o : o + _SEG_LEN] for o in range(0, len(buf), _SEG_LEN)]
    crcs = _crc32c_batch(segs)  # every segment ≤ _SEG_LEN: no recursion
    op = _zero_advance_op(8 * _SEG_LEN)
    crc = int(crcs[0])
    for j in range(1, len(segs)):
        if len(segs[j]) == _SEG_LEN:
            crc = _gf2_times(op, crc) ^ int(crcs[j])
        else:  # final short segment
            crc = crc32c_combine(crc, int(crcs[j]), len(segs[j]))
    return crc


def _crc32c_batch(bufs: list[bytes]) -> np.ndarray:
    n = len(bufs)
    out = np.empty(n, np.uint32)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in bufs), np.int64, n)
    order = np.argsort(lens, kind="stable")
    g0 = 0
    while g0 < n:
        if lens[order[g0]] > _LONG_LEN:
            # ascending order → everything from here on is long
            for i in order[g0:]:
                out[i] = _crc32c_long(bufs[i])
            break
        # grow the pad group while the dense matrix stays under the cap
        # (sorted ascending → the group max is its last element)
        g1 = g0 + 1
        while (
            g1 < n
            and lens[order[g1]] <= _LONG_LEN
            and (g1 - g0 + 1) * int(lens[order[g1]]) <= _PAD_CAP
        ):
            g1 += 1
        idx = order[g0:g1]
        out[idx] = _crc32c_matrix([bufs[i] for i in idx], lens[idx])
        g0 = g1
    return out


def _mask_batch(crc: np.ndarray) -> np.ndarray:
    rot = ((crc >> np.uint32(15)) | (crc << np.uint32(17))) & np.uint32(0xFFFFFFFF)
    return (rot + np.uint32(_MASK_DELTA)) & np.uint32(0xFFFFFFFF)


def frame_records(records: list[bytes]) -> bytes:
    """Frame already-encoded payloads into TFRecord bytes (batched crcs)."""
    if not records:
        return b""
    len_bufs = [struct.pack("<Q", len(r)) for r in records]
    len_crcs = _mask_batch(_crc32c_batch(len_bufs))
    data_crcs = _mask_batch(_crc32c_batch(records))
    parts: list[bytes] = []
    for i, r in enumerate(records):
        parts.append(len_bufs[i])
        parts.append(struct.pack("<I", int(len_crcs[i])))
        parts.append(r)
        parts.append(struct.pack("<I", int(data_crcs[i])))
    return b"".join(parts)


# crc verification stays vectorized on the streaming path by batching
# records into groups of up to this many payload bytes before the two
# `_crc32c_batch` passes run — per-record scalar crc would bottleneck
# the whole read leg.  Also the framer's memory bound: pending
# yet-unverified records never exceed max(_VERIFY_GROUP_BYTES, one
# record).
_VERIFY_GROUP_BYTES = 32 << 20


def iter_records_stream(chunks, *, verify: bool = True) -> Iterator[bytes]:
    """Incrementally frame TFRecord payloads from a byte-chunk stream;
    loud on any corruption.

    The bounded-memory core of the TFRecord ingest leg: only the
    current partial record plus one crc-verification group (~32 MB) is
    buffered, so a foreign multi-GB shard costs O(record + group), not
    O(shard).  Verification is batched: frames are walked first (cheap
    struct reads), then each group's length-crcs and data-crcs check in
    two vectorized `_crc32c_batch` passes."""
    buf = bytearray()
    base = 0  # absolute stream offset of buf[0], for error messages
    pend_recs: list[bytes] = []
    pend_lens: list[bytes] = []
    pend_want: list[tuple[int, int, int]] = []  # (len_crc, data_crc, offset)
    pend_bytes = 0

    def verified() -> list[bytes]:
        nonlocal pend_recs, pend_lens, pend_want, pend_bytes
        got_len = _mask_batch(_crc32c_batch(pend_lens))
        got_data = _mask_batch(_crc32c_batch(pend_recs))
        for i, (want_l, want_d, off) in enumerate(pend_want):
            if int(got_len[i]) != want_l:
                raise ValueError(f"TFRecord length crc mismatch at byte {off}")
            if int(got_data[i]) != want_d:
                raise ValueError(f"TFRecord data crc mismatch at byte {off}")
        out = pend_recs
        pend_recs, pend_lens, pend_want, pend_bytes = [], [], [], 0
        return out

    for chunk in chunks:
        buf.extend(chunk)
        pos = 0
        while True:
            if len(buf) - pos < 12:
                break
            (length,) = struct.unpack_from("<Q", buf, pos)
            dend = pos + 12 + length
            if dend + 4 > len(buf):
                if verify:
                    # the length's own crc sits in the SAME 12 bytes we
                    # already have: check it BEFORE trusting the length
                    # to ask for more data — a corrupted length field
                    # would otherwise buffer the entire remaining shard
                    # (O(shard) memory) and die with a misleading
                    # 'truncated' error instead of a crc mismatch.
                    # Scalar crc, but only on incomplete-buffer breaks
                    # (~once per input chunk), so the vectorized batch
                    # path still carries the per-record work.
                    want = struct.unpack_from("<I", buf, pos + 8)[0]
                    if _masked_crc(bytes(buf[pos : pos + 8])) != want:
                        raise ValueError(
                            f"TFRecord length crc mismatch at byte {base + pos}"
                        )
                break
            rec = bytes(buf[pos + 12 : dend])
            if verify:
                pend_recs.append(rec)
                pend_lens.append(bytes(buf[pos : pos + 8]))
                pend_want.append(
                    (
                        struct.unpack_from("<I", buf, pos + 8)[0],
                        struct.unpack_from("<I", buf, dend)[0],
                        base + pos,
                    )
                )
                pend_bytes += len(rec)
            else:
                yield rec
            pos = dend + 4
        base += pos
        del buf[:pos]
        if pend_bytes >= _VERIFY_GROUP_BYTES:
            yield from verified()
    if buf:
        kind = "header" if len(buf) < 12 else "data"
        raise ValueError(f"truncated TFRecord {kind} at byte {base}")
    if pend_recs:
        yield from verified()


def parse_records(buf: bytes, *, verify: bool = True) -> list[bytes]:
    """Parse TFRecord bytes → payload list; loud on any corruption."""
    return list(iter_records_stream([buf], verify=verify))


def iter_records(buf: bytes, *, verify: bool = True) -> Iterator[bytes]:
    """Yield record payloads from TFRecord bytes; loud on any corruption."""
    yield from iter_records_stream([buf], verify=verify)


# ---------------------------------------------------------------------------
# protobuf wire codec (just enough for example.proto / feature.proto)

def _varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # int64 negatives: 10-byte two's-complement varint
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            # a 10-byte varint can carry up to 70 significand bits;
            # protobuf semantics are value mod 2^64 — without the mask a
            # non-canonical encoding silently decodes to a >64-bit int
            # that _signed64 then mis-normalizes
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _ld(field: int, payload: bytes) -> bytes:
    """length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _take(buf: bytes, pos: int, ln: int) -> tuple[bytes, int]:
    """Bounds-checked slice of a length-delimited payload: a declared
    length that runs past the buffer is malformed input and must raise,
    not silently truncate the value (the container CRC covers our own
    shards, but foreign records reach this codec unchecked)."""
    end = pos + ln
    if end > len(buf):
        raise ValueError(
            f"truncated protobuf: field declares {ln} bytes, "
            f"{len(buf) - pos} remain"
        )
    return buf[pos:end], end


_KIND_FIELD = {"bytes": 1, "float": 2, "int64": 3}
_FIELD_KIND = {v: k for k, v in _KIND_FIELD.items()}


def encode_example(features: dict[str, tuple[str, list]]) -> bytes:
    """Encode ``{name: (kind, values)}`` → ``tf.train.Example`` bytes.

    kind ∈ {"bytes", "float", "int64"}; values is a list (bytes / float /
    int). Keys are serialized sorted so encoding is deterministic.
    """
    entries: list[bytes] = []
    for name in sorted(features):
        kind, values = features[name]
        if kind == "bytes":
            inner = b"".join(_ld(1, v) for v in values)
        elif kind == "float":
            inner = _ld(1, np.asarray(values, "<f4").tobytes())  # packed
        elif kind == "int64":
            inner = _ld(1, b"".join(_varint(int(v)) for v in values))  # packed
        else:
            raise ValueError(f"unknown feature kind {kind!r}")
        feature = _ld(_KIND_FIELD[kind], inner)
        entry = _ld(1, name.encode()) + _ld(2, feature)
        entries.append(_ld(1, entry))
    features_msg = b"".join(entries)
    return _ld(1, features_msg)  # Example.features = 1


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _decode_numeric_list(buf: bytes, kind: str) -> list:
    """Parse BytesList/FloatList/Int64List message bytes."""
    values: list = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field != 1:
            pos = _skip_field(buf, pos, wire)
            continue
        if kind == "bytes":
            if wire != 2:
                raise ValueError("BytesList value must be length-delimited")
            ln, pos = _read_varint(buf, pos)
            v, pos = _take(buf, pos, ln)
            values.append(v)
        elif kind == "float":
            if wire == 2:  # packed
                ln, pos = _read_varint(buf, pos)
                raw, pos = _take(buf, pos, ln)
                if ln % 4:
                    raise ValueError(
                        f"packed FloatList length {ln} not a multiple of 4"
                    )
                values.extend(float(x) for x in np.frombuffer(raw, "<f4"))
            elif wire == 5:  # unpacked fixed32
                raw, pos = _take(buf, pos, 4)
                values.append(float(np.frombuffer(raw, "<f4", 1)[0]))
            else:
                raise ValueError("FloatList value has wrong wire type")
        else:  # int64
            if wire == 2:  # packed
                ln, pos = _read_varint(buf, pos)
                stop = pos + ln
                if stop > len(buf):
                    raise ValueError(
                        f"truncated packed Int64List: {ln} bytes declared, "
                        f"{len(buf) - pos} remain"
                    )
                while pos < stop:
                    v, pos = _read_varint(buf, pos)
                    values.append(_signed64(v))
                if pos != stop:
                    raise ValueError("packed Int64List overran declared length")
            elif wire == 0:
                v, pos = _read_varint(buf, pos)
                values.append(_signed64(v))
            else:
                raise ValueError("Int64List value has wrong wire type")
    return values


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        _, pos = _take(buf, pos, 8)
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        _, pos = _take(buf, pos, ln)
    elif wire == 5:
        _, pos = _take(buf, pos, 4)
    else:
        raise ValueError(f"unsupported protobuf wire type {wire}")
    return pos


def _iter_submessages(buf: bytes, want_field: int) -> Iterator[bytes]:
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == want_field and wire == 2:
            ln, pos = _read_varint(buf, pos)
            sub, pos = _take(buf, pos, ln)
            yield sub
        else:
            pos = _skip_field(buf, pos, wire)


def decode_example(
    data: bytes, wanted: frozenset[str] | set[str] | None = None
) -> dict[str, tuple[str, list]]:
    """Decode ``tf.train.Example`` bytes → ``{name: (kind, values)}``.

    ``wanted`` prunes the decode: features whose name is not in the set
    are skipped without parsing their value lists — the reader passes
    its schema's column names, so a 2-column read of a 20-feature
    record pays for 2 value parses (the protobuf analogue of parquet
    column pruning)."""
    out: dict[str, tuple[str, list]] = {}
    for features_msg in _iter_submessages(data, 1):  # Example.features
        for entry in _iter_submessages(features_msg, 1):  # map entry
            name: str | None = None
            feature: bytes | None = None
            pos = 0
            while pos < len(entry):
                tag, pos = _read_varint(entry, pos)
                field, wire = tag >> 3, tag & 7
                if field == 1 and wire == 2:  # key
                    ln, pos = _read_varint(entry, pos)
                    raw, pos = _take(entry, pos, ln)
                    name = raw.decode()
                elif field == 2 and wire == 2:  # value (Feature)
                    ln, pos = _read_varint(entry, pos)
                    feature, pos = _take(entry, pos, ln)
                else:
                    pos = _skip_field(entry, pos, wire)
            if name is None or feature is None:
                raise ValueError("Features map entry missing key or value")
            if wanted is not None and name not in wanted:
                continue
            pos = 0
            while pos < len(feature):
                tag, pos = _read_varint(feature, pos)
                field, wire = tag >> 3, tag & 7
                kind = _FIELD_KIND.get(field)
                if kind is None or wire != 2:
                    pos = _skip_field(feature, pos, wire)
                    continue
                ln, pos = _read_varint(feature, pos)
                raw, pos = _take(feature, pos, ln)
                out[name] = (kind, _decode_numeric_list(raw, kind))
    return out


# ---------------------------------------------------------------------------
# Spark column mapping

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)


def _column_kind(field: T.StructField, allow_f32_demotion: bool) -> tuple[str, bool]:
    """→ (feature kind, is_list) for a Spark column; loud on unsupported."""
    dt = field.dataType
    is_list = isinstance(dt, T.ArrayType)
    if is_list:
        dt = dt.elementType
    if isinstance(dt, T.StringType) or isinstance(dt, T.BinaryType):
        return "bytes", is_list
    if isinstance(dt, _INT_TYPES):
        return "int64", is_list
    if isinstance(dt, T.FloatType):
        return "float", is_list
    if isinstance(dt, T.DoubleType):
        if not allow_f32_demotion:
            raise TypeError(
                f"column {field.name!r} is double but FloatList is float32; "
                "cast to float explicitly or pass allow_f32_demotion=True"
            )
        return "float", is_list
    raise TypeError(
        f"column {field.name!r}: {field.dataType.simpleString()} has no "
        "tf.train.Feature mapping (bytes/string/int/float/arrays thereof)"
    )


def _encode_arrow_batch(
    batch: pa.RecordBatch, kinds: dict[str, tuple[str, bool]]
) -> list[bytes]:
    # to_pylist (not pandas): int64 stays exact with NULLs present, and
    # NULL (→ missing feature) stays distinct from float NaN (→ a
    # FloatList carrying NaN)
    cols = {
        name: batch.column(batch.schema.get_field_index(name)).to_pylist()
        for name in kinds
    }
    records: list[bytes] = []
    for i in range(batch.num_rows):
        feats: dict[str, tuple[str, list]] = {}
        for name, (kind, is_list) in kinds.items():
            v = cols[name][i]
            if v is None:
                continue  # missing feature == absent from the map (TF convention)
            values = v if is_list else [v]
            if is_list and any(x is None for x in values):
                # a whole-NULL cell maps to a missing feature, but a NULL
                # *element* has no tf.train.Feature representation — name
                # the column instead of dying in int(None) deep in a task
                raise ValueError(
                    f"column {name!r} holds a NULL array element; "
                    "tf.train.Feature value lists cannot represent NULLs — "
                    "filter or fill them before writing"
                )
            if kind == "bytes":
                values = [x.encode() if isinstance(x, str) else bytes(x) for x in values]
            elif kind == "int64":
                values = [int(x) for x in values]
            else:
                values = [float(x) for x in values]
            feats[name] = (kind, values)
        records.append(encode_example(feats))
    return records


_WRITE_STATS, _WRITE_STATS_PA = stores.write_stats_schemas("records")


def write_tfrecords(
    df: DataFrame,
    path: str,
    *,
    shard_records: int | None = None,
    allow_f32_demotion: bool = False,
    compression: str | None = None,
    _shard_prefix: str = "part",
    _merge_manifest: bool = False,
) -> dict:
    """Write a DataFrame as TFRecord shards of ``tf.train.Example``.

    One shard object per ``shard_records`` rows of each input partition
    (default: one shard per partition) named
    ``part-{partition:05d}-{seq:04d}.tfrecord`` — the layout every
    tf.data-style consumer globs. ``compression="gzip"`` gzips each
    whole shard (the ``TFRecordOptions(compression_type="GZIP")``
    convention; shards get a ``.gz`` suffix and tf.data reads them with
    that option). mtime/OS bytes in the gzip header are pinned so equal
    rows still produce identical shard bytes. Fully distributed
    mapInArrow; the only driver write is the schema sidecar. Returns
    ``{"shards": n, "records": n, "bytes": n}``.
    """
    stores.assert_executor_reachable(path, "write_tfrecords")
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression {compression!r} (None or 'gzip')")
    suffix = ".tfrecord.gz" if compression else ".tfrecord"
    kinds = {f.name: _column_kind(f, allow_f32_demotion) for f in df.schema.fields}
    schema_json = df.schema.json()

    def write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import gzip
        import io

        from pyspark import TaskContext

        store, key = stores.resolve(path)
        pid = TaskContext.get().partitionId()
        pending: list[bytes] = []
        names: list[str] = []
        seq = n_records = n_bytes = 0

        def flush(recs: list[bytes]) -> None:
            nonlocal seq, n_bytes
            if not recs:
                return
            blob = frame_records(recs)
            if compression:
                out = io.BytesIO()
                with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                    gz.write(blob)
                blob = out.getvalue()
            name = f"{_shard_prefix}-{pid:05d}-{seq:04d}{suffix}"
            store.put(stores.join(key, name), blob)
            names.append(name)
            seq += 1
            n_bytes += len(blob)

        for batch in batches:
            recs = _encode_arrow_batch(batch, kinds)
            n_records += len(recs)
            pending.extend(recs)
            if shard_records and len(pending) >= shard_records:
                # drain by index: re-slicing the remainder per shard
                # would copy O(shards x remaining) list entries
                off = 0
                while len(pending) - off >= shard_records:
                    flush(pending[off : off + shard_records])
                    off += shard_records
                pending = pending[off:]
        flush(pending)
        yield pa.RecordBatch.from_pydict(
            {
                "shards": [len(names)],
                "records": [n_records],
                "bytes": [n_bytes],
                "shard_names": [names],
            },
            schema=_WRITE_STATS_PA,
        )

    return stores.finalize_shard_write(
        df,
        write,
        _WRITE_STATS,
        path,
        _META_NAME,
        {"format": "xbs-tfrecord-v1", "schema": json.loads(schema_json)},
        _merge_manifest,
    )


def _from_feature(
    kind_values, want_kind: str, is_list: bool, dt: T.DataType, name: str
):
    if kind_values is None:
        return None
    kind, values = kind_values
    if kind != want_kind:
        raise ValueError(
            f"column {name!r}: feature holds {kind}, column wants {want_kind}"
        )
    if want_kind == "bytes" and isinstance(dt, T.StringType):
        values = [v.decode() for v in values]
    elif want_kind == "int64" and isinstance(dt, T.BooleanType):
        values = [bool(v) for v in values]
    if is_list:
        return values
    if len(values) > 1:
        # foreign shards can hold multi-value features; reading one into
        # a scalar column must not silently drop values[1:]
        raise ValueError(
            f"column {name!r}: feature holds {len(values)} values but the "
            f"schema says scalar {dt.simpleString()}; read it as "
            f"array<{dt.simpleString()}>"
        )
    return values[0] if values else None


def read_tfrecords(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    files: list[str] | None = None,
    batch_bytes: int | None = None,
) -> DataFrame:
    """Read TFRecord shards back into a DataFrame.

    ``schema`` may be a StructType, a DDL string, or None (use the
    writer's sidecar). ``files`` overrides shard discovery with an
    explicit relative-name list (foreign, sidecar-less exports on
    listing-less stores — e.g. a plain-http tf.data shard set — are
    unreadable any other way); it requires an explicit ``schema``
    unless a sidecar also exists. Otherwise the shard set comes from
    the sidecar's manifest when present (one GET — works on
    listing-less stores), falling back to a directory listing for
    foreign shard directories; each task then fetches and decodes only
    its shards, crc verified. An empty-but-present manifest (e.g. an
    empty first streaming micro-batch) reads back as zero rows — only
    failed *discovery* raises. Missing features decode as NULL; extra
    features in a record are ignored (protobuf-style forward
    compatibility). ``batch_bytes`` caps the per-flush RecordBatch
    payload (default ~64 MB) — per-task memory is O(record + batch),
    not O(shard).
    """
    stores.assert_executor_reachable(path, "read_tfrecords")
    store, key = stores.resolve(path)
    manifest: list[str] | None = None
    raw = store.get(stores.join(key, _META_NAME))
    if raw is not None:
        meta = json.loads(raw.decode())
        if meta.get("format") != "xbs-tfrecord-v1":
            raise ValueError(f"unrecognized sidecar format {meta.get('format')!r}")
        manifest = meta.get("shards")
        if schema is None:
            schema = T.StructType.fromJson(meta["schema"])
    if schema is None:
        raise FileNotFoundError(
            f"no schema given and no {_META_NAME} sidecar under {path!r}"
        )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    shard_names = stores.discover_shards(
        store, key, path, files, manifest, (".tfrecord", ".tfrecord.gz")
    )
    from pyspark.sql.pandas.types import to_arrow_schema

    pa_schema = to_arrow_schema(schema)
    fields = [(f.name, _column_kind(f, True), f.dataType) for f in schema.fields]
    wanted = frozenset(f.name for f in schema.fields)

    def read(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        store, key = stores.resolve(path)
        # bounded-memory leg (same shape as the WARC readers): ranged-GET
        # chunks → streaming gunzip → incremental crc-verified framing →
        # ~64 MB RecordBatch flushes.  Per-task memory is
        # O(record + batch), independent of shard size.
        bb = bytestream.BatchBuilder(pa_schema, batch_bytes)
        for batch in batches:
            for shard in batch.column(0).to_pylist():
                chunks = stores.iter_blob(
                    store,
                    stores.join(key, shard),
                    missing=f"shard {shard!r} vanished under {path!r}",
                )
                if shard.endswith(".gz"):
                    # dispatch on the suffix, NOT a magic-byte sniff: a
                    # valid uncompressed shard whose first record length
                    # is ≡ 0x8B1F (mod 2^16) starts with the gzip magic
                    chunks = bytestream.iter_gunzip(chunks)
                for rec in iter_records_stream(chunks):
                    feats = decode_example(rec, wanted)
                    rows = bb.rows
                    for name, (kind, is_list), dt in fields:
                        elem = dt.elementType if is_list else dt
                        rows[name].append(
                            _from_feature(feats.get(name), kind, is_list, elem, name)
                        )
                    yield from bb.note(len(rec))
        yield bb.final()

    shards = spark.createDataFrame(
        [(s,) for s in shard_names], "shard string"
    ).repartition(stores.shard_read_partitions(spark, len(shard_names)))
    return shards.mapInArrow(read, schema)


def tfrecord_stream_sink(
    path: str,
    *,
    shard_records: int | None = None,
    compression: str | None = None,
    allow_f32_demotion: bool = False,
):
    """``foreachBatch`` callback: exactly-once streaming TFRecord export.

    Each micro-batch lands as its own shard set under
    ``batch-{id:06d}-…`` names (no cross-batch collisions even with
    repeated partition ids) and the sidecar manifest grows per batch, so
    a reader always sees a consistent snapshot. Replayed batch ids are
    skipped via a batch-id high-water marker NEXT TO the directory (the
    standard foreachBatch idempotency pattern, same as the Zarr append
    sink) — a retried batch re-puts byte-identical shards anyway, but
    the marker spares the recompute and keeps the manifest idempotent.

    Usage::

        q = (df.writeStream.foreachBatch(tfrecord_stream_sink(out))
               .trigger(availableNow=True).start())
    """
    stores.assert_executor_reachable(path, "tfrecord_stream_sink")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_tfrecords(
            batch_df,
            path,
            shard_records=shard_records,
            compression=compression,
            allow_f32_demotion=allow_f32_demotion,
            _shard_prefix=f"batch-{batch_id:06d}",
            _merge_manifest=True,
        )

    return stores.exactly_once_batch_sink(path, write_batch)
