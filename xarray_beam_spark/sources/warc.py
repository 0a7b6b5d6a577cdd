"""WARC / WET (ISO 28500) source + sink: the web-corpus ingest format.

The reference (xarray-beam) has no crawl surface; this module is part of
the training-data-pipeline extension. Every open web corpus (C4,
RefinedWeb, the Common Crawl-derived sets) begins life as WARC files —
and their text-extraction derivative, WET ("conversion" records holding
plain text) is the usual entry point for LLM data work. The format is a
tiny PUBLIC spec (ISO 28500 / the WARC 1.0 format document):

    WARC/1.0<CRLF>
    Name: value<CRLF> ...          (header block)
    <CRLF>
    <Content-Length bytes of payload>
    <CRLF><CRLF>                   (record separator)

Files are either plain or gzip with ONE MEMBER PER RECORD (the Common
Crawl convention — member boundaries are what make records individually
fetchable via byte-range indexes); python's gzip handles multi-member
streams natively, so both read identically here.

Scale shape mirrors the other export/ingest legs: the reader lists the
shard set once (sidecar manifest when our writer produced it, directory
listing for foreign dirs, or an explicit file list for e.g. a Common
Crawl WET.paths slice), parallelizes it, and each task parses only its
files via ``mapInArrow``. The writer is zero-shuffle per-partition shard
puts. Reading is bounded-memory end to end: ranged GETs through the
Store seam (``stores.iter_blob``) feed a streaming gunzip and an
incremental record framer (:func:`iter_warc_records`), and decoded rows
leave the task as ~64 MB RecordBatch flushes — per-task memory is
O(record + batch) regardless of shard size, so a foreign Common Crawl
WARC (~1 GB gzip / ~4-5 GB decoded) never costs its decoded size.
Malformed records fail loudly: bad magic, short payload, missing
mandatory headers — never silently skipped.
"""

from __future__ import annotations

import codecs
import gzip
import io
import json
import re
import itertools
import uuid
import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from xarray_beam_spark.sources import bytestream, stores

_META_NAME = "_xbs_wet_meta.json"
_CRLF = b"\r\n"


def gunzip_members(buf: bytes) -> bytes:
    """Multi-member gzip decompress in O(n).

    stdlib ``gzip.decompress`` materializes ``unused_data`` — a copy of
    the ENTIRE remaining stream — once per member, which is quadratic on
    Common-Crawl-style one-member-per-record files (measured 3 MB/s on a
    2048-member 16 MB shard). Delegates to the streaming
    :func:`bytestream.iter_gunzip`, which feeds bounded slices so each
    member's leftover copy is capped at the slice size.
    """
    return b"".join(bytestream.iter_gunzip([buf]))


def _parse_header_block(block: bytes) -> dict[str, str]:
    """One WARC header block (version line + name:value lines, LWS
    folding) → lower-cased name→value dict; loud on structural damage."""
    headers: dict[str, str] = {}
    # split on explicit line terminators, NOT splitlines(): header
    # values are arbitrary UTF-8 and may contain U+0085/U+2028-class
    # characters that splitlines would treat as line breaks
    raw_lines = block.replace(b"\r\n", b"\n").split(b"\n")
    lines = [ln.decode("utf-8", "replace") for ln in raw_lines]
    version = lines[0].strip()
    if not version.startswith("WARC/"):
        raise ValueError(f"bad WARC version line {version!r}")
    last_name: str | None = None
    for line in lines[1:]:
        if line[:1] in (" ", "\t"):  # ISO 28500 LWS-folded continuation
            if last_name is None:
                raise ValueError(f"continuation line before any header: {line!r}")
            headers[last_name] += " " + line.strip()
            continue
        name, colon, value = line.partition(":")
        if not colon:
            raise ValueError(f"malformed WARC header line {line!r}")
        last_name = name.strip().lower()
        headers[last_name] = value.strip()
    return headers


def iter_warc_records(chunks) -> Iterator[dict]:
    """Incrementally frame WARC records from a (decompressed) byte-chunk
    stream → record dicts ``{headers: {lower-name: value}, payload:
    bytes}``; loud on structural damage.

    This is the bounded-memory core of the ingest legs: it buffers only
    the current record's header block + payload (plus one input chunk),
    so a multi-GB foreign shard costs O(record), not O(shard).  Consumed
    bytes are compacted out of the buffer after every record.
    """
    it = iter(chunks)
    buf = bytearray()
    base = 0  # absolute stream offset of buf[0], for error messages
    eof = False

    def pull() -> bool:
        nonlocal eof
        if eof:
            return False
        nxt = next(it, None)
        if nxt is None:
            eof = True
            return False
        buf.extend(nxt)
        return True

    while True:
        # tolerate inter-record padding newlines
        pos = 0
        while True:
            while pos < len(buf) and buf[pos] in (0x0D, 0x0A):
                pos += 1
            if pos < len(buf) or not pull():
                break
        base += pos
        del buf[:pos]
        if not buf:
            return  # clean end of stream
        # accumulate the header block.  It ends at the FIRST blank line —
        # CRLF per spec, but tolerate bare-LF writers; the LF probe is
        # BOUNDED by the CRLF hit (an \n\n strictly before it wins).  A
        # failed search re-scans the buffered prefix on the next chunk,
        # but header blocks are ~1 KB vs MB-sized chunks, so the rescan
        # is O(1) amortized per record (payload bytes are skipped by
        # length below and never scanned).
        while True:
            if len(buf) >= 5:
                if not buf.startswith(b"WARC/"):
                    raise ValueError(f"expected WARC/ magic at byte {base}")
                crlf_end = buf.find(b"\r\n\r\n")
                lf_end = buf.find(
                    b"\n\n", 0, crlf_end + 3 if crlf_end >= 0 else len(buf)
                )
                if crlf_end >= 0 and (lf_end < 0 or crlf_end < lf_end):
                    hdr_end, sep = crlf_end, 4
                    break
                if lf_end >= 0:
                    hdr_end, sep = lf_end, 2
                    break
            elif not buf.startswith(b"WARC/"[: len(buf)]):
                raise ValueError(f"expected WARC/ magic at byte {base}")
            if not pull():
                if len(buf) < 5:  # stream ends inside the magic itself
                    raise ValueError(f"expected WARC/ magic at byte {base}")
                raise ValueError(f"unterminated WARC header block at byte {base}")
        headers = _parse_header_block(bytes(buf[:hdr_end]))
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        length = int(headers["content-length"])
        if length < 0:
            raise ValueError(f"negative Content-Length at byte {base}")
        body_start = hdr_end + sep
        while len(buf) < body_start + length:
            if not pull():
                raise ValueError(
                    f"truncated WARC payload at byte {base + body_start} "
                    f"(need {length} bytes)"
                )
        yield {
            "headers": headers,
            "payload": bytes(buf[body_start : body_start + length]),
        }
        base += body_start + length
        del buf[: body_start + length]


def _iter_warc_stream(chunks) -> Iterator[dict]:
    """Sniff gzip magic on a raw shard chunk stream, then frame records."""
    it = iter(chunks)
    head = b""
    while len(head) < 2:
        nxt = next(it, None)
        if nxt is None:
            break
        head += nxt
    if not head:
        return
    full = itertools.chain([head], it)
    if head[:2] == b"\x1f\x8b":
        full = bytestream.iter_gunzip(full)  # one member per record (CC)
    yield from iter_warc_records(full)


def parse_warc(buf: bytes) -> list[dict]:
    """Parse WARC bytes → record dicts ``{headers: {lower-name: value},
    payload: bytes}``; loud on structural damage."""
    return list(_iter_warc_stream([buf]))


def _record_uuid(url: str, date: str, text: str, *extra: str) -> uuid.UUID:
    """Deterministic per-record id: uuid5 over (url, capture date,
    content, extra distinguishers), NUL-separated.  The date term keeps
    two captures of an UNCHANGED page (same url + body, e.g. a recrawl
    in one export) distinct per ISO 28500 §5.2's per-record uniqueness;
    the response writer adds its per-row content type so two rows
    differing only there stay distinct too.  Identical writer inputs
    still reproduce byte-identical shards."""
    name = chr(0).join((url, date, text, *extra))
    return uuid.uuid5(uuid.NAMESPACE_URL, name)


def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    out = bytearray(b"WARC/1.0\r\n")
    for name, value in headers:
        # CR/LF in a header value is header injection: a newline embedded
        # in a crawled URL would open an extra header line (e.g. flipping
        # WARC-Type so the record vanishes from read_wet's conversion
        # filter). Loud failure, matching the writer's NULL-rejection.
        if "\r" in name or "\n" in name or "\r" in value or "\n" in value:
            raise ValueError(
                f"WARC header {name!r} contains CR/LF (value {value!r}); "
                "scrub newlines from urls/dates before writing"
            )
        out += f"{name}: {value}\r\n".encode()
    out += f"Content-Length: {len(payload)}\r\n".encode()
    out += _CRLF
    out += payload
    out += _CRLF + _CRLF
    return bytes(out)


def _gzip_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


_WET_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("content_length", T.LongType()),
])

_WRITE_STATS, _WRITE_STATS_PA = stores.write_stats_schemas("records")


class _Sharder:
    """Per-task shard accumulator shared by the WET and HTTP-response
    writers: buffers record bytes, flushes every ``shard_records`` into
    ``part-{pid:05d}-{seq:04d}{suffix}`` opened by a ``warcinfo`` record
    whose id derives from the shard name (deterministic per shard for
    idempotent retries, unique across shards per ISO 28500)."""

    def __init__(
        self,
        store,
        key,
        pid,
        suffix,
        *,
        shard_records,
        compress,
        default_date,
        prefix: str = "part",
    ):
        self.store, self.key, self.pid, self.suffix = store, key, pid, suffix
        self.shard_records, self.compress = shard_records, compress
        self.default_date = default_date
        self.prefix = prefix
        self.names: list[str] = []
        self.seq = self.n_records = self.n_bytes = 0
        self.parts: list[bytes] = []
        self.in_shard = 0

    def _shard_header(self, shard_name: str) -> bytes:
        info = (
            b"software: xarray_beam_spark.sources.warc\r\n"
            b"format: WARC File Format 1.0\r\n"
        )
        rec = _record_bytes(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", self.default_date),  # mandatory for EVERY record
                (
                    "WARC-Record-ID",
                    f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, f'xbs-warcinfo/{shard_name}')}>",
                ),
                ("Content-Type", "application/warc-fields"),
            ],
            info,
        )
        return _gzip_member(rec) if self.compress else rec

    def add(self, record: bytes) -> None:
        self.parts.append(_gzip_member(record) if self.compress else record)
        self.n_records += 1
        self.in_shard += 1
        if self.shard_records and self.in_shard >= self.shard_records:
            self.flush()

    def flush(self) -> None:
        if self.in_shard == 0:
            return
        name = f"{self.prefix}-{self.pid:05d}-{self.seq:04d}{self.suffix}"
        blob = self._shard_header(name) + b"".join(self.parts)
        self.store.put(stores.join(self.key, name), blob)
        self.names.append(name)
        self.seq += 1
        self.n_bytes += len(blob)
        self.parts = []
        self.in_shard = 0

    def stats_batch(self) -> pa.RecordBatch:
        self.flush()
        return pa.RecordBatch.from_pydict(
            {
                "shards": [len(self.names)],
                "records": [self.n_records],
                "bytes": [self.n_bytes],
                "shard_names": [self.names],
            },
            schema=_WRITE_STATS_PA,
        )


def _run_shard_write(
    narrowed, write, path: str, meta_name: str, fmt: str, merge: bool = False
) -> dict:
    return stores.finalize_shard_write(
        narrowed, write, _WRITE_STATS, path, meta_name, {"format": fmt}, merge
    )


def _discover_shards(
    store,
    key,
    path: str,
    files: list[str] | None,
    meta_name: str,
    fmt: str,
    suffixes: tuple[str, ...],
) -> list[str]:
    """Parse the format-checked sidecar manifest, then run the shared
    files→manifest→listing cascade (``stores.discover_shards``)."""
    manifest = None
    if files is None:
        raw = store.get(stores.join(key, meta_name))
        if raw is not None:
            meta = json.loads(raw.decode())
            if meta.get("format") != fmt:
                raise ValueError(
                    f"unrecognized sidecar format {meta.get('format')!r}"
                )
            manifest = meta.get("shards")
    return stores.discover_shards(store, key, path, files, manifest, suffixes)


def write_wet(
    df: DataFrame,
    path: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    default_date: str = "2026-01-01T00:00:00Z",
    shard_records: int | None = None,
    compress: bool = True,
    _shard_prefix: str = "part",
    _merge_manifest: bool = False,
) -> dict:
    """Write (url, text) rows as WET shards of ``conversion`` records.

    Each shard opens with a ``warcinfo`` record (the WET convention) and
    is gzip'd one member per record so foreign range-index tooling can
    address records individually. Record IDs are uuid5 of (url, text) —
    deterministic, so equal rows give byte-identical shards (idempotent
    retries, hash-certifiable gates), yet globally unique even when the
    same URL appears with different content. NULL urls/texts are
    rejected loudly (a conversion record without both has no meaning).
    """
    stores.assert_executor_reachable(path, "write_wet")
    for c in (url_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    suffix = ".warc.wet.gz" if compress else ".warc.wet"
    cols = [url_col, text_col] + ([date_col] if date_col else [])
    narrowed = df.select(*cols)

    def write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        store, key = stores.resolve(path)
        sh = _Sharder(
            store,
            key,
            TaskContext.get().partitionId(),
            suffix,
            shard_records=shard_records,
            compress=compress,
            default_date=default_date,
            prefix=_shard_prefix,
        )
        for batch in batches:
            urls = batch.column(batch.schema.get_field_index(url_col)).to_pylist()
            texts = batch.column(batch.schema.get_field_index(text_col)).to_pylist()
            dates = (
                batch.column(batch.schema.get_field_index(date_col)).to_pylist()
                if date_col
                else [default_date] * batch.num_rows
            )
            for url, text, date in zip(urls, texts, dates):
                if url is None or text is None:
                    raise ValueError(
                        "WET conversion records need both url and text; "
                        "filter NULL rows before writing"
                    )
                rec = _record_bytes(
                    [
                        ("WARC-Type", "conversion"),
                        ("WARC-Target-URI", url),
                        ("WARC-Date", date or default_date),
                        (
                            # record IDs must be globally unique (ISO
                            # 28500 §5.2) — a page crawled twice with
                            # identical text (an unchanged recrawl in one
                            # export) is routine, so the capture DATE
                            # participates alongside url + content in the
                            # (still deterministic) id
                            "WARC-Record-ID",
                            f"<urn:uuid:{_record_uuid(url, date or default_date, text)}>",
                        ),
                        ("Content-Type", "text/plain"),
                    ],
                    text.encode(),
                )
                sh.add(rec)
        yield sh.stats_batch()

    return _run_shard_write(
        narrowed, write, path, _META_NAME, "xbs-wet-v1", merge=_merge_manifest
    )


def read_wet(
    spark: SparkSession,
    path: str,
    *,
    files: list[str] | None = None,
    batch_bytes: int | None = None,
) -> DataFrame:
    """Read WET shards → (url, warc_date, record_id, text, content_length).

    ``files`` overrides shard discovery with an explicit relative-name
    list (the Common Crawl ``wet.paths`` workflow: hand the reader a
    slice of the published manifest). Otherwise the writer's sidecar
    manifest is used, falling back to a directory listing for foreign
    dirs. Only ``conversion`` records become rows (warcinfo/request/
    response records in mixed WARC inputs are skipped — they carry no
    extracted text); structural damage in ANY record fails the task.
    ``batch_bytes`` caps the per-flush RecordBatch payload (default
    ~64 MB) — per-task memory is O(record + batch), not O(shard).
    """
    stores.assert_executor_reachable(path, "read_wet")
    store, key = stores.resolve(path)
    shard_names = _discover_shards(
        store,
        key,
        path,
        files,
        _META_NAME,
        "xbs-wet-v1",
        (".warc", ".warc.gz", ".warc.wet", ".warc.wet.gz"),
    )
    from pyspark.sql.pandas.types import to_arrow_schema

    pa_schema = to_arrow_schema(_WET_SCHEMA)

    def read(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        store, key = stores.resolve(path)
        # bounded-memory leg: ranged-GET chunks → streaming gunzip →
        # incremental record framing → ~64 MB RecordBatch flushes.  Peak
        # per-task memory is O(record + batch), independent of shard
        # size — a foreign Common Crawl shard (~1 GB gz / ~4-5 GB
        # decoded) no longer costs its decoded size 3-5x over.
        bb = bytestream.BatchBuilder(pa_schema, batch_bytes)
        for batch in batches:
            for shard in batch.column(0).to_pylist():
                chunks = stores.iter_blob(
                    store,
                    stores.join(key, shard),
                    missing=f"shard {shard!r} vanished under {path!r}",
                )
                for rec in _iter_warc_stream(chunks):
                    h = rec["headers"]
                    if h.get("warc-type") != "conversion":
                        continue
                    rows = bb.rows
                    rows["url"].append(h.get("warc-target-uri"))
                    rows["warc_date"].append(h.get("warc-date"))
                    rows["record_id"].append(h.get("warc-record-id"))
                    rows["text"].append(rec["payload"].decode("utf-8", "replace"))
                    rows["content_length"].append(len(rec["payload"]))
                    yield from bb.note(len(rec["payload"]))
        yield bb.final()

    shards = spark.createDataFrame(
        [(s,) for s in shard_names], "shard string"
    ).repartition(stores.shard_read_partitions(spark, len(shard_names)))
    return shards.mapInArrow(read, _WET_SCHEMA)


# ---------------------------------------------------------------------------
# WARC *response* records: the crawl→HTML→text entry point.
#
# A real C4/RefinedWeb pipeline does not start from WET extractions — it
# starts from the crawl's ``response`` records, whose payload is the raw
# captured HTTP message (status line + headers + body, RFC 7230 framing).
# This leg splits the HTTP head from the body, honors the declared
# Transfer-Encoding/charset, and hands decoded markup to
# ``functions.text.html_to_text`` — the same entry-point role
# ``open_zarr`` (reference xarray_beam/_src/zarr.py:71-96) plays for the
# reference's pipelines.
# ---------------------------------------------------------------------------

_WARC_META_NAME = "_xbs_warc_meta.json"

_CHARSET_RE = re.compile(r'charset\s*=\s*"?\'?([A-Za-z0-9._\-]+)', re.IGNORECASE)


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split a captured HTTP response message → (status, headers, body).

    Loud on structural damage — a truncated head (no blank line before
    the body) or a malformed status line raises; a body whose head
    declares ``Transfer-Encoding: chunked`` is de-chunked (trailers
    dropped). Repeated header names join with ", " (RFC 7230 §3.2.2);
    names are lowercased. The WARC record's Content-Length is the
    framing authority, so an HTTP-level Content-Length is reported but
    never used to re-cut the body.
    """
    crlf_end = payload.find(b"\r\n\r\n")
    lf_end = payload.find(b"\n\n", 0, crlf_end + 3 if crlf_end >= 0 else None)
    if crlf_end >= 0 and (lf_end < 0 or crlf_end < lf_end):
        head, body = payload[:crlf_end], payload[crlf_end + 4 :]
    elif lf_end >= 0:
        head, body = payload[:lf_end], payload[lf_end + 2 :]
    else:
        raise ValueError("truncated HTTP head: no blank line before body")
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status_line = lines[0].decode("latin-1")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].upper().startswith("HTTP/") or not parts[1].isdigit():
        raise ValueError(f"malformed HTTP status line {status_line[:60]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    last_name: str | None = None
    for raw in lines[1:]:
        line = raw.decode("latin-1")
        if not line.strip():
            continue
        if line[:1] in (" ", "\t"):  # obs-fold continuation
            if last_name is None:
                raise ValueError(f"continuation line before any header: {line!r}")
            headers[last_name] += " " + line.strip()
            continue
        name, colon, value = line.partition(":")
        if not colon:
            raise ValueError(f"malformed HTTP header line {line[:60]!r}")
        last_name = name.strip().lower()
        if last_name in headers:
            headers[last_name] += ", " + value.strip()
        else:
            headers[last_name] = value.strip()
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    # content-coding comes off AFTER the transfer-coding (RFC 7230 §3.3:
    # Transfer-Encoding is hop-by-hop and applied last). A gzip body
    # decoded as text would be silent mojibake — the failure class this
    # module exists to prevent — so decode it here; unsupported codings
    # (br, compress) raise rather than pass compressed bytes downstream.
    ce = headers.get("content-encoding", "").strip().lower()
    if ce in ("", "identity"):
        pass
    elif ce in ("gzip", "x-gzip"):
        try:
            body = gunzip_members(body)
        except (zlib.error, ValueError) as e:
            # normalize to ValueError: this function's loud-failure
            # contract (and read_warc_responses' WARC-Truncated
            # tolerance) keys on ValueError, and zlib.error isn't one
            raise ValueError(f"bad gzip content-coding: {e}") from None
    elif ce == "deflate":
        try:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                # raw-deflate variant: servers historically sent either
                body = zlib.decompress(body, -15)
        except zlib.error as e:
            raise ValueError(f"bad deflate content-coding: {e}") from None
    else:
        raise ValueError(f"unsupported Content-Encoding {ce!r}")
    return status, headers, body


def _dechunk(body: bytes) -> bytes:
    """Decode a chunked transfer-coding body; loud on truncation."""
    out: list[bytes] = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated chunked body: missing chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()  # drop extensions
        # strict RFC 7230 chunk-size grammar (1*HEXDIG): int(tok, 16)
        # also parses signs and '0x' prefixes — a NEGATIVE size would
        # move pos backwards and silently RETURN garbage re-read from
        # already-consumed bytes instead of failing loudly
        if not size_tok or not all(c in b"0123456789abcdefABCDEF" for c in size_tok):
            raise ValueError(f"bad chunk size {size_tok[:16]!r}")
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) are dropped
        if pos + size > len(body):
            raise ValueError("truncated chunk payload")
        out.append(body[pos : pos + size])
        pos += size
        if body[pos : pos + 2] != b"\r\n":
            raise ValueError("chunk missing CRLF terminator")
        pos += 2


def decode_http_body(body: bytes, content_type: str | None) -> tuple[str, str | None]:
    """Decode an HTTP body per its Content-Type charset → (text, charset).

    The charset label is matched case-insensitively and looked up via the
    codec registry (so ``ISO-8859-1``/``latin-1``/``windows-1252`` all
    resolve); an absent or unknown label falls back to utf-8. Decode is
    ``errors="replace"`` — crawl bytes routinely lie about their charset
    and a crawl ingest must not die on one mojibake page.
    """
    charset = None
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            charset = m.group(1)
    enc = "utf-8"
    if charset:
        try:
            info = codecs.lookup(charset)
            # the codec registry also resolves bytes↔bytes transforms
            # (base64, hex, zip, …) whose .decode would then raise on a
            # bytes+errors call — a page declaring charset=base64 must
            # fall back, not kill the task
            if getattr(info, "_is_text_encoding", True):
                enc = charset
        except LookupError:
            pass  # unknown label → utf-8 fallback
    try:
        return body.decode(enc, "replace"), charset
    except (LookupError, TypeError):  # belt-and-braces for exotic codecs
        return body.decode("utf-8", "replace"), charset


_RESPONSE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("status", T.LongType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("charset", T.StringType()),
    T.StructField("body", T.StringType()),
    T.StructField("content_length", T.LongType()),
    # the WARC-Truncated reason ("length", "time", …) or NULL — crawlers
    # mark captures they cut short; pipelines filter on this
    T.StructField("truncated", T.StringType()),
])


def write_warc_responses(
    df: DataFrame,
    path: str,
    *,
    url_col: str = "url",
    body_col: str = "body",
    content_type_col: str | None = None,
    date_col: str | None = None,
    default_content_type: str = "text/html; charset=utf-8",
    default_date: str = "2026-01-01T00:00:00Z",
    shard_records: int | None = None,
    compress: bool = True,
    _shard_prefix: str = "part",
    _merge_manifest: bool = False,
) -> dict:
    """Write (url, body) rows as WARC ``response`` records.

    Each record's payload is a minimal captured HTTP/1.1 200 message —
    status line, Content-Type (per-row column or the default),
    Content-Length, blank line, then the body encoded with the charset
    its own Content-Type declares (loud on unencodable text — writing a
    page whose declared charset cannot represent it would corrupt the
    capture). Deterministic bytes end to end: uuid5 record ids, shared
    ``_Sharder`` shard framing. Primarily a test/fixture leg — real
    pipelines *read* foreign crawls — but it makes the response parser
    certifiable document-exactly.
    """
    stores.assert_executor_reachable(path, "write_warc_responses")
    for c in (url_col, body_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    suffix = ".warc.gz" if compress else ".warc"
    cols = [url_col, body_col]
    if content_type_col:
        cols.append(content_type_col)
    if date_col:
        cols.append(date_col)
    narrowed = df.select(*cols)

    def write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        store, key = stores.resolve(path)
        sh = _Sharder(
            store,
            key,
            TaskContext.get().partitionId(),
            suffix,
            shard_records=shard_records,
            compress=compress,
            default_date=default_date,
            prefix=_shard_prefix,
        )
        for batch in batches:
            urls = batch.column(batch.schema.get_field_index(url_col)).to_pylist()
            bodies = batch.column(batch.schema.get_field_index(body_col)).to_pylist()
            n = batch.num_rows
            ctypes = (
                batch.column(batch.schema.get_field_index(content_type_col)).to_pylist()
                if content_type_col
                else [default_content_type] * n
            )
            dates = (
                batch.column(batch.schema.get_field_index(date_col)).to_pylist()
                if date_col
                else [default_date] * n
            )
            for url, text, ctype, date in zip(urls, bodies, ctypes, dates):
                if url is None or text is None:
                    raise ValueError(
                        "response records need both url and body; "
                        "filter NULL rows before writing"
                    )
                ctype = ctype or default_content_type
                # same injection class _record_bytes rejects for WARC
                # headers: a CR/LF inside a per-row content type would
                # end the framed HTTP head early and silently corrupt
                # the capture (verified: body swallows the real head)
                if "\r" in ctype or "\n" in ctype:
                    raise ValueError(
                        f"content type {ctype!r} contains CR/LF; scrub "
                        "newlines before writing"
                    )
                m = _CHARSET_RE.search(ctype)
                enc = m.group(1) if m else "utf-8"
                body = text.encode(enc)  # loud on unencodable text
                http = (
                    f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("latin-1") + body
                rec = _record_bytes(
                    [
                        ("WARC-Type", "response"),
                        ("WARC-Target-URI", url),
                        ("WARC-Date", date or default_date),
                        (
                            "WARC-Record-ID",
                            f"<urn:uuid:{_record_uuid(url, date or default_date, text, ctype)}>",
                        ),
                        ("Content-Type", "application/http; msgtype=response"),
                    ],
                    http,
                )
                sh.add(rec)
        yield sh.stats_batch()

    return _run_shard_write(
        narrowed, write, path, _WARC_META_NAME, "xbs-warc-v1", merge=_merge_manifest
    )


def read_warc_responses(
    spark: SparkSession,
    path: str,
    *,
    files: list[str] | None = None,
    batch_bytes: int | None = None,
) -> DataFrame:
    """Read WARC ``response`` records → decoded HTTP captures.

    Columns: url, warc_date, record_id, status, content_type, charset
    (the label the page *declared*, NULL if none), body (decoded text —
    de-chunked, content-decoded (gzip/deflate), charset-decoded; pair
    with ``functions.text.html_to_text`` for the crawl→HTML→text
    pipeline), content_length (byte length of the decoded body),
    truncated (the WARC-Truncated reason, NULL if whole). A capture the
    crawler MARKED truncated whose body no longer parses/decompresses
    yields its row with a NULL body instead of failing the task;
    unmarked damage stays loud.

    ``files`` overrides shard discovery (the Common Crawl ``warc.paths``
    workflow); otherwise the writer's sidecar manifest is used, falling
    back to a directory listing for foreign dirs. Only records whose
    WARC-Type is ``response`` with an ``application/http`` payload
    become rows (warcinfo/request/metadata/conversion records in mixed
    inputs carry no HTTP response and are skipped); structural damage in
    any parsed record — WARC framing, HTTP head, chunked coding — fails
    the task loudly.
    """
    stores.assert_executor_reachable(path, "read_warc_responses")
    store, key = stores.resolve(path)
    shard_names = _discover_shards(
        store,
        key,
        path,
        files,
        _WARC_META_NAME,
        "xbs-warc-v1",
        (".warc", ".warc.gz"),
    )
    from pyspark.sql.pandas.types import to_arrow_schema

    pa_schema = to_arrow_schema(_RESPONSE_SCHEMA)

    def read(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        store, key = stores.resolve(path)
        # same bounded-memory shape as read_wet: ranged-GET chunks →
        # streaming gunzip → incremental framing → ~64 MB flushes.  The
        # canonical foreign input here is Common Crawl WARC (~1 GB gz /
        # ~4-5 GB decoded), where O(shard) materialization would cost
        # ~10+ GB per task.
        bb = bytestream.BatchBuilder(pa_schema, batch_bytes)
        for batch in batches:
            for shard in batch.column(0).to_pylist():
                chunks = stores.iter_blob(
                    store,
                    stores.join(key, shard),
                    missing=f"shard {shard!r} vanished under {path!r}",
                )
                for rec in _iter_warc_stream(chunks):
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    ctype_hdr = h.get("content-type", "")
                    # media types are case-insensitive (RFC 2045); a
                    # foreign 'Application/HTTP' capture must not vanish
                    if not ctype_hdr.lower().startswith("application/http"):
                        continue
                    trunc = h.get("warc-truncated")
                    try:
                        status, http_headers, body = parse_http_response(
                            rec["payload"]
                        )
                        ctype = http_headers.get("content-type")
                        text, charset = decode_http_body(body, ctype)
                        blen = len(body)
                    except ValueError:
                        # the crawler MARKED this capture incomplete
                        # (WARC-Truncated, ISO 28500 §5.13) — a cut-off
                        # chunked or gzip body is expected, not damage.
                        # Surface the row with a NULL body so pipelines
                        # can count/filter it; UNMARKED damage still
                        # fails the task loudly.
                        if trunc is None:
                            raise
                        status = ctype = text = charset = blen = None
                    rows = bb.rows
                    rows["url"].append(h.get("warc-target-uri"))
                    rows["warc_date"].append(h.get("warc-date"))
                    rows["record_id"].append(h.get("warc-record-id"))
                    rows["status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["charset"].append(charset)
                    rows["body"].append(text)
                    rows["content_length"].append(blen)
                    rows["truncated"].append(trunc)
                    # note the DECODED text size, not the record payload:
                    # the payload is the compressed-on-the-wire capture,
                    # so a content-coded shard would inflate the flush
                    # bound by its compression ratio (the O(shard)-class
                    # blowup this bound exists to prevent)
                    yield from bb.note(len(text or ""))
        yield bb.final()

    shards = spark.createDataFrame(
        [(s,) for s in shard_names], "shard string"
    ).repartition(stores.shard_read_partitions(spark, len(shard_names)))
    return shards.mapInArrow(read, _RESPONSE_SCHEMA)


def wet_stream_sink(
    path: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    shard_records: int | None = None,
    compress: bool = True,
):
    """``foreachBatch`` callback: exactly-once streaming WET export.

    Same idiom as the TFRecord/WebDataset stream sinks (shared
    ``stores.exactly_once_batch_sink`` high-water wrapper): each
    micro-batch lands as its own ``batch-{id:06d}-…`` shard set, the
    sidecar manifest grows per batch, replayed batch ids are skipped.

    Usage::

        q = (df.writeStream.foreachBatch(wet_stream_sink(out))
               .trigger(availableNow=True).start())
    """
    stores.assert_executor_reachable(path, "wet_stream_sink")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_wet(
            batch_df,
            path,
            url_col=url_col,
            text_col=text_col,
            date_col=date_col,
            shard_records=shard_records,
            compress=compress,
            _shard_prefix=f"batch-{batch_id:06d}",
            _merge_manifest=True,
        )

    return stores.exactly_once_batch_sink(path, write_batch)


def warc_responses_stream_sink(
    path: str,
    *,
    url_col: str = "url",
    body_col: str = "body",
    content_type_col: str | None = None,
    date_col: str | None = None,
    shard_records: int | None = None,
    compress: bool = True,
):
    """``foreachBatch`` callback: exactly-once streaming WARC-response
    export (continuous crawl archiving). Same high-water idiom as the
    other stream sinks."""
    stores.assert_executor_reachable(path, "warc_responses_stream_sink")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_warc_responses(
            batch_df,
            path,
            url_col=url_col,
            body_col=body_col,
            content_type_col=content_type_col,
            date_col=date_col,
            shard_records=shard_records,
            compress=compress,
            _shard_prefix=f"batch-{batch_id:06d}",
            _merge_manifest=True,
        )

    return stores.exactly_once_batch_sink(path, write_batch)
