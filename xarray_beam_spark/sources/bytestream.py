"""Bounded-memory byte-stream helpers shared by the shard readers.

The ingest legs (WARC/WET ``warc.py``, TFRecord ``tfrecord.py``,
WebDataset ``webdataset.py``) read *foreign* shards whose size the
reader does not control — a Common Crawl WARC is ~1 GB gzipped and
~4-5 GB decoded.  Materializing whole shards (blob + decompressed
stream + row lists + one RecordBatch, all live at once) makes per-task
memory O(shard) with a 3-5x constant; with one read task per core that
is hundreds of GB per node on foreign data.  These helpers make every
reader O(record + batch) instead:

- :func:`iter_gunzip` — streaming multi-member gunzip over a chunk
  iterator; both input buffering and per-yield output are bounded.
- :func:`reader` — adapts a chunk iterator to a file-like object so
  ``tarfile`` can run in its non-seeking stream mode (``"r|"``).
- :class:`BatchBuilder` — accumulates decoded rows and flushes an Arrow
  RecordBatch every ~``flush_bytes``, so a 5 GB shard leaves a task as
  dozens of bounded batches rather than one giant one.

(The byte *source* for all of these is ``stores.iter_blob`` — ranged
GETs through the Store seam.)
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

import pyarrow as pa

# Input slice per decompress call: bounds each member's unused_data
# leftover copy (the quadratic-gunzip fix) at this size.
_IN_CHUNK = 1 << 13
# Hard cap on a single decompressed yield via zlib's max_length: without
# it a highly compressible input slice could expand ~1032x (DEFLATE's
# maximum ratio) in one call.
_OUT_CHUNK = 1 << 20

# Default RecordBatch flush threshold for the shard readers: large
# enough that Arrow/pickle framing overhead amortizes, small enough
# that 32 concurrent read tasks hold ~2 GB of pending rows worst-case.
FLUSH_BYTES = 64 << 20


def iter_gunzip(
    chunks, in_chunk: int = _IN_CHUNK, out_chunk: int = _OUT_CHUNK
) -> Iterator[bytes]:
    """Streaming multi-member gunzip: chunk iterator in, bounded
    decompressed chunks out.

    stdlib ``gzip.decompress`` materializes ``unused_data`` — a copy of
    the ENTIRE remaining stream — once per member, which is quadratic on
    Common-Crawl-style one-member-per-record files.  Feeding bounded
    slices caps each member's leftover copy at ``in_chunk``, and the
    ``max_length`` drain loop caps a single yield at ``out_chunk`` even
    on maximally compressible input (DEFLATE can expand ~1032x), so the
    generator holds O(in_chunk + out_chunk) bytes regardless of stream
    size.  Loud on a truncated final member.
    """
    o = zlib.decompressobj(wbits=31)
    mid_member = False  # current member has consumed bytes, no eof yet
    carry: bytes | None = None
    for data in chunks:
        view = memoryview(data)
        pos, n = 0, len(view)
        while pos < n or carry is not None:
            if carry is not None:
                piece, carry = carry, None
            else:
                nxt = min(pos + in_chunk, n)
                piece = view[pos:nxt]
                pos = nxt
            while True:
                out = o.decompress(piece, out_chunk)
                mid_member = True
                if out:
                    yield out
                if o.eof:
                    rem = o.unused_data  # <= in_chunk bytes by construction
                    o = zlib.decompressobj(wbits=31)
                    mid_member = False
                    if rem:
                        carry = rem
                    break
                piece = o.unconsumed_tail
                if not piece and len(out) < out_chunk:
                    # input consumed and output not clipped: fully
                    # drained for this slice (a clipped full-size out
                    # may still hold pending window expansion — loop
                    # with empty input until it runs dry or hits eof)
                    break
    if mid_member:
        raise ValueError("truncated gzip member")


class _ChunkIO(io.RawIOBase):
    """File-like view over a chunk iterator (sequential reads only)."""

    def __init__(self, chunks) -> None:
        self._it = iter(chunks)
        self._buf = memoryview(b"")

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        while not self._buf:
            nxt = next(self._it, None)
            if nxt is None:
                return 0
            self._buf = memoryview(nxt)
        n = min(len(b), len(self._buf))
        b[:n] = self._buf[:n]
        self._buf = self._buf[n:]
        return n


def reader(chunks) -> io.BufferedReader:
    """Chunk iterator -> buffered file-like object.

    This is what lets ``tarfile.open(mode="r|")`` walk a WebDataset
    shard without the whole tar in memory: stream mode reads members
    strictly forward and never seeks backwards.
    """
    return io.BufferedReader(_ChunkIO(chunks))


class BatchBuilder:
    """Accumulate per-column row lists; flush RecordBatches at a byte bound.

    Shared by the shard readers so a multi-GB foreign shard leaves the
    task as many bounded batches instead of one O(shard) batch.  Usage::

        bb = BatchBuilder(pa_schema, flush_bytes)
        for record in ...:
            bb.rows["col"].append(value); ...
            for batch in bb.note(approx_row_bytes):
                yield batch
        yield bb.final()

    ``note`` must be called once per appended row with an estimate of
    the row's payload size; column lists must stay equal-length between
    ``note`` calls.  ``final()`` always returns a (possibly empty)
    batch, preserving the pre-streaming readers' behavior of emitting at
    least one batch per task.
    """

    _ROW_OVERHEAD = 64  # per-row Python/Arrow bookkeeping estimate

    def __init__(self, pa_schema: pa.Schema, flush_bytes: int | None = None):
        self.pa_schema = pa_schema
        self.flush_bytes = FLUSH_BYTES if flush_bytes is None else flush_bytes
        self.rows: dict[str, list] = {f.name: [] for f in pa_schema}
        self._bytes = 0

    def _build(self) -> pa.RecordBatch:
        batch = pa.RecordBatch.from_arrays(
            [pa.array(self.rows[f.name], type=f.type) for f in self.pa_schema],
            schema=self.pa_schema,
        )
        self.rows = {f.name: [] for f in self.pa_schema}
        self._bytes = 0
        return batch

    def note(self, nbytes: int) -> Iterator[pa.RecordBatch]:
        self._bytes += nbytes + self._ROW_OVERHEAD
        if self._bytes >= self.flush_bytes:
            yield self._build()

    def final(self) -> pa.RecordBatch:
        return self._build()
