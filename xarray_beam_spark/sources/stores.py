"""Pluggable byte-blob storage backends for the zarrlite store.

The reference reaches object stores through fsspec (``zarr.py:374-386``);
fsspec is not in this container, so zarrlite talks to a four-method
``Store`` seam instead — everything it needs from ANY backend:

- ``get(key) -> bytes | None`` (None = missing, mapped to fill_value)
- ``put(key, data)`` — atomic-per-key (task retries / speculative
  execution must never expose a torn blob)
- ``exists(key) -> bool``
- ``list_dir(key) -> list[str]`` — immediate child names

Paths carry their backend as a URL scheme, resolved per call via
``resolve(path)``; plain paths mean the (shared) local filesystem.  This
keeps ``ZArray.path`` a plain string, so executors re-open stores by path
(one metadata read per task) and never deserialize driver objects — the
same "compact serialization" rule the file-backed path follows.

Backends:
- local filesystem (default; atomic via write-temp + rename)
- ``mem://name/...`` in-process dict store — proves the seam and backs
  fast tests.  Process-local by design: usable driver-side and in unit
  tests, NOT across executor Python workers.  A real object-store backend
  (S3/GCS) implements the same four methods with multipart puts; nothing
  in zarrlite changes.
"""

from __future__ import annotations

import os
import threading


class Store:
    """Byte-blob store interface (see module docstring).

    ``get_range``/``get_tail`` are OPTIONAL fast paths with working
    defaults (fetch-whole + slice): v3 shard objects are read index-tail
    first, then only the needed inner chunks — the entire point of the
    sharding layout on an object store. Backends where partial reads are
    native (file seek, HTTP Range) override them."""

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def put(self, key: str, data: bytes) -> None:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def list_dir(self, key: str) -> list[str]:
        raise NotImplementedError

    def get_range(self, key: str, start: int, length: int) -> bytes | None:
        """Bytes ``[start, start+length)`` of the object (shorter at the
        object's end); None = missing object."""
        data = self.get(key)
        return None if data is None else data[start : start + length]

    def get_tail(self, key: str, length: int) -> bytes | None:
        """The object's last ``length`` bytes (the whole object when
        smaller); None = missing object."""
        if length <= 0:
            # data[-0:] would be the WHOLE object, contradicting the
            # contract (FsStore/HttpStore already special-case this)
            data = self.get(key)
            return None if data is None else b""
        data = self.get(key)
        return None if data is None else data[-length:]

    def ranges_degraded(self, key: str) -> bool:
        """True when this backend has LEARNED that ranged reads for this
        object degrade to whole-object transfers (e.g. an HTTP server
        answering 200 to Range requests).  Streaming readers consult it
        to fall back to one whole ``get`` instead of re-downloading the
        object once per chunk."""
        return False


class FsStore(Store):
    """Local/shared filesystem; keys are absolute paths."""

    def get(self, key: str) -> bytes | None:
        try:
            with open(key, "rb") as f:
                return f.read()
        except (FileNotFoundError, IsADirectoryError):
            return None

    def put(self, key: str, data: bytes) -> None:
        parent = os.path.dirname(key)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{key}.tmp.{os.getpid()}.{id(data)}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, key)  # atomic on POSIX

    def exists(self, key: str) -> bool:
        return os.path.exists(key)

    def list_dir(self, key: str) -> list[str]:
        try:
            return sorted(os.listdir(key))
        except (FileNotFoundError, NotADirectoryError):
            return []

    def get_range(self, key: str, start: int, length: int) -> bytes | None:
        try:
            with open(key, "rb") as f:
                f.seek(start)
                return f.read(length)
        except (FileNotFoundError, IsADirectoryError):
            return None

    def get_tail(self, key: str, length: int) -> bytes | None:
        try:
            with open(key, "rb") as f:
                f.seek(0, os.SEEK_END)
                size = f.tell()
                f.seek(max(0, size - length))
                return f.read()
        except (FileNotFoundError, IsADirectoryError):
            return None


class MemStore(Store):
    """In-process dict store (flat key space, '/'-separated keys)."""

    def __init__(self) -> None:
        self.blobs: dict[str, bytes] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _norm(key: str) -> str:
        return key.strip("/")

    def get(self, key: str) -> bytes | None:
        return self.blobs.get(self._norm(key))

    def put(self, key: str, data: bytes) -> None:
        with self._lock:  # dict assignment of one immutable value: atomic
            self.blobs[self._norm(key)] = bytes(data)

    def exists(self, key: str) -> bool:
        k = self._norm(key)
        if k in self.blobs:
            return True
        prefix = f"{k}/" if k else ""
        with self._lock:  # snapshot: a concurrent put (foreachBatch /
            blobs = list(self.blobs)  # thread_map) must not grow the dict mid-iteration
        return any(b.startswith(prefix) for b in blobs) if prefix else bool(blobs)

    def list_dir(self, key: str) -> list[str]:
        k = self._norm(key)
        prefix = f"{k}/" if k else ""
        with self._lock:
            blobs = list(self.blobs)
        children = {b[len(prefix):].split("/", 1)[0] for b in blobs if b.startswith(prefix)}
        return sorted(children)


class HttpStore(Store):
    """Object-store backend over plain HTTP(S) — the minimal cloud seam
    (the reference reaches S3/GCS through fsspec, ``zarr.py:374-386``;
    fsspec is absent here, and S3/GCS auth aside, their data path IS
    GETs/PUTs over HTTP).

    Semantics: ``get`` = one GET (404/410 → None = missing chunk →
    fill_value, like a missing file); ``put`` = one whole-object PUT —
    atomic-per-key exactly the way S3/GCS object PUTs are (an object
    never reads back torn; the test server mirrors that with
    write-temp + rename); ``exists`` = HEAD with GET fallback;
    ``list_dir`` returns [] — object stores have no cheap native
    listing either, which is exactly why zarr grew consolidated
    metadata: ``open_group`` reads ``.zmetadata`` in ONE request and
    never lists. Servers without PUT enabled answer 405/501 and the
    error says so. Real S3/GCS additionally need signed auth headers —
    out of scope here; the four-method seam is what they'd implement.

    ``latency_bound = True`` switches chunk IO to the threaded path
    (``iothread.thread_map``) — per-request latency, not bandwidth, is
    what dominates remote small-object reads AND writes (hence
    :func:`copy_tree` for staged metadata pushes)."""

    latency_bound = True

    def __init__(self, scheme: str) -> None:
        self.scheme = scheme
        self._local = threading.local()  # per-thread keep-alive conns
        # hosts observed answering 200 to Range requests (range support
        # is a HOST property, so the memory is instance-wide, not
        # per-thread — every reader thread benefits from one probe)
        self._rangeless: set[str] = set()

    def _url(self, key: str) -> str:
        return f"{self.scheme}://{key}"

    def _conn(self, netloc: str):
        import http.client

        conns = getattr(self._local, "conns", None)
        if conns is None:
            conns = self._local.conns = {}
        c = conns.get(netloc)
        if c is None:
            cls = (
                http.client.HTTPSConnection
                if self.scheme == "https"
                else http.client.HTTPConnection
            )
            c = conns[netloc] = cls(netloc, timeout=60)
        return c

    def _request(
        self,
        method: str,
        key: str,
        body: bytes | None = None,
        headers: dict[str, str] | None = None,
    ) -> tuple[int, bytes]:
        """One keep-alive request; a fresh TCP(+TLS) handshake per chunk
        would double the very per-request latency the threaded IO path
        exists to hide. Connections are per-thread (http.client is not
        thread-safe) and retried once on a stale/broken socket — safe
        for PUT too because object PUTs are idempotent whole-object
        replaces."""
        import http.client
        from urllib.parse import quote

        netloc, _, path = key.partition("/")
        path = "/" + quote(path)
        last: Exception | None = None
        for attempt in (0, 1):
            conn = self._conn(netloc)
            try:
                conn.request(method, path, body=body, headers=headers or {})
                resp = conn.getresponse()
                data = resp.read()  # drain so the connection is reusable
                return resp.status, data
            except (http.client.HTTPException, ConnectionError, OSError) as e:
                conn.close()
                self._local.conns.pop(netloc, None)
                last = e
        raise last  # type: ignore[misc]

    def get(self, key: str) -> bytes | None:
        status, body = self._request("GET", key)
        if status in (404, 410):
            return None
        if status != 200:
            raise OSError(f"GET {self._url(key)} -> HTTP {status}")
        return body

    def _ranged(self, key: str, range_value: str, length: int) -> bytes | None:
        """One Range GET (``bytes=a-b`` or suffix ``bytes=-n``). Servers
        without range support answer 200 with the full body — slice it
        (one whole-object transfer for this call) and REMEMBER the host
        as range-degraded so streaming readers (``iter_blob``) switch to
        a single whole ``get`` instead of re-downloading the object once
        per chunk (O(n^2) transfer otherwise)."""
        status, body = self._request("GET", key, headers={"Range": range_value})
        if status in (404, 410):
            return None
        if status == 206:
            return body
        if status == 200:
            self._rangeless.add(key.partition("/")[0])  # set.add: thread-safe
            if range_value.startswith("bytes=-"):
                return body[-length:]
            start = int(range_value[len("bytes="):].split("-", 1)[0])
            return body[start : start + length]
        if status == 416:  # range not satisfiable: object shorter than asked
            if not range_value.startswith("bytes=-"):
                # a start-range 416 PROVES the object exists (missing →
                # 404 above) with size <= start: the answer is empty — a
                # full-object fallback GET here would double the
                # transfer of every exact-multiple-of-chunk-size object
                # read through iter_blob
                return b""
            data = self.get(key)
            if data is None:
                return None
            return data[-length:]
        raise OSError(f"GET {self._url(key)} ({range_value}) -> HTTP {status}")

    def ranges_degraded(self, key: str) -> bool:
        return key.partition("/")[0] in self._rangeless

    def get_range(self, key: str, start: int, length: int) -> bytes | None:
        if length <= 0:
            return b""
        return self._ranged(key, f"bytes={start}-{start + length - 1}", length)

    def get_tail(self, key: str, length: int) -> bytes | None:
        if length <= 0:
            return b""
        return self._ranged(key, f"bytes=-{length}", length)

    def put(self, key: str, data: bytes) -> None:
        status, _ = self._request("PUT", key, body=bytes(data))
        if status in (405, 501):
            raise NotImplementedError(
                f"server does not accept PUT {self._url(key)} (HTTP {status}); "
                "this endpoint is read-only"
            )
        if status not in (200, 201, 204):
            raise OSError(f"PUT {self._url(key)} -> HTTP {status}")

    def delete(self, key: str) -> None:
        """Best-effort object delete (not part of the 4-method seam the
        zarr paths need — zarr never deletes — but completes the verb
        set for external cleanup tooling)."""
        status, _ = self._request("DELETE", key)
        if status in (405, 501):
            raise NotImplementedError(
                f"server does not accept DELETE {self._url(key)} (HTTP {status})"
            )
        if status not in (200, 202, 204, 404, 410):
            raise OSError(f"DELETE {self._url(key)} -> HTTP {status}")

    def exists(self, key: str) -> bool:
        status, _ = self._request("HEAD", key)
        if status in (404, 410):
            return False
        if status == 405:  # server without HEAD: fall back to GET
            return self.get(key) is not None
        if status != 200:
            raise OSError(f"HEAD {self._url(key)} -> HTTP {status}")
        return True

    def list_dir(self, key: str) -> list[str]:
        return []


_FS = FsStore()
_HTTP = HttpStore("http")
_HTTPS = HttpStore("https")
_MEM: dict[str, MemStore] = {}
_MEM_LOCK = threading.Lock()


def memory_store(name: str) -> MemStore:
    """The (process-global) MemStore behind ``mem://name/...`` paths."""
    with _MEM_LOCK:
        if name not in _MEM:
            _MEM[name] = MemStore()
        return _MEM[name]


def assert_executor_reachable(path: str, what: str) -> None:
    """Refuse ``mem://`` for data that Spark tasks must read or write.

    A MemStore is one python process's dict; executor workers are
    separate processes, so a distributed write would scatter blobs
    across workers (and vanish with them) while the job happily reports
    success. Driver-side unit use is what mem:// is for.
    """
    if path.startswith("mem://"):
        raise ValueError(
            f"{what} needs a store executors can reach; mem:// is "
            "process-local to the driver. Use a filesystem or http(s) path."
        )


def exactly_once_batch_sink(path: str, write_batch):
    """Wrap a per-batch writer as an idempotent ``foreachBatch`` callback.

    The standard exactly-once idiom (same as the Zarr append sink's
    ``BatchHighWater``): a monotone batch-id high-water marker lives
    NEXT TO the output directory, replayed batch ids are skipped, and
    the marker commits only after the batch's write returns.
    """
    store, key = resolve(path.rstrip("/") + "_highwater")

    def callback(batch_df, batch_id: int) -> None:
        raw = store.get(key)
        if raw is not None and int(raw) >= batch_id:
            return  # replayed batch: already committed
        write_batch(batch_df, batch_id)
        store.put(key, str(batch_id).encode())

    return callback


def write_stats_schemas(count_field: str):
    """The (Spark, Arrow) schema pair for per-task shard-writer stats —
    the exact positional contract :func:`finalize_shard_write` consumes
    (c0..c3).  ONE definition parameterized on the count-field name
    ("records"/"samples"), so the three shard writers cannot drift."""
    import pyarrow as pa
    from pyspark.sql import types as T

    spark_schema = T.StructType([
        T.StructField("shards", T.LongType()),
        T.StructField(count_field, T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("shard_names", T.ArrayType(T.StringType())),
    ])
    pa_schema = pa.schema([
        ("shards", pa.int64()),
        (count_field, pa.int64()),
        ("bytes", pa.int64()),
        ("shard_names", pa.list_(pa.string())),
    ])
    return spark_schema, pa_schema


def finalize_shard_write(
    narrowed,
    write,
    stats_schema,
    path: str,
    meta_name: str,
    meta: dict,
    merge: bool,
) -> dict:
    """Shared tail of every shard writer (TFRecord/WebDataset/WET/WARC):
    run the zero-shuffle ``mapInArrow`` write, reduce per-task stats to
    one row, and publish the sidecar that doubles as the shard MANIFEST
    (listing-less stores have no list_dir, and even on object stores one
    GET beats a LIST — the consolidated-metadata move the Zarr path
    makes). ``merge`` (streaming appends) unions with the existing
    manifest instead of replacing it, after checking every ``meta``
    field against the prior sidecar's contract."""
    import json as _json

    from pyspark.sql import functions as F

    # the stats schema IS the contract: (shards, <count>, bytes,
    # shard_names) — the count field's own name keys the returned dict,
    # so a caller cannot mislabel it
    c0, c1, c2, c3 = stats_schema.fieldNames()
    stats = (
        # bounded driver aggregate: one row of totals plus the shard-name
        # list for the manifest sidecar — ~25 B per shard name, so ~25 MB
        # even at a million shards. This is the ONLY driver-side size term
        # on the export path; row data never leaves the executors.
        narrowed.mapInArrow(write, stats_schema)
        .agg(F.sum(c0), F.sum(c1), F.sum(c2), F.flatten(F.collect_list(c3)))
        .collect()[0]
    )
    store, key = resolve(path)
    shards = sorted(stats[3] or [])
    if merge:
        raw = store.get(join(key, meta_name))
        if raw is not None:
            prev = _json.loads(raw.decode())
            for k, v in meta.items():
                if prev.get(k) != v:
                    raise ValueError(
                        f"appending to {path!r} with a different {k} than "
                        "its existing sidecar records"
                    )
            shards = sorted(set(prev.get("shards") or []) | set(shards))
    store.put(
        join(key, meta_name),
        _json.dumps({**meta, "shards": shards}, sort_keys=True).encode(),
    )
    return {
        "shards": int(stats[0] or 0),
        c1: int(stats[1] or 0),
        "bytes": int(stats[2] or 0),
    }


def iter_blob(
    store: Store,
    key: str,
    *,
    chunk_size: int = 8 << 20,
    missing: str | None = None,
):
    """Stream an object's bytes as bounded chunks through the Store seam.

    Backends with native partial reads (file seek, HTTP Range) serve
    ``chunk_size`` ranged GETs, so the reader never holds more than one
    chunk of the raw object — the piece that makes the shard-ingest legs
    O(record + batch) instead of O(shard).  Backends still on the
    fetch-whole ``Store.get_range`` default would turn repeated ranged
    reads into O(n^2) transfer, so they are detected and served as ONE
    ``get`` sliced into chunks (memory O(object), exactly the old
    whole-blob behavior — never worse).

    Raises ``FileNotFoundError(missing or key)`` if the object is
    missing, including an object that vanishes mid-read (a short
    manifest-vs-store race must fail loudly, not truncate silently).
    """
    def sliced(data: bytes, start: int):
        view = memoryview(data)
        for pos in range(start, len(view), chunk_size):
            yield bytes(view[pos : pos + chunk_size])

    if type(store).get_range is Store.get_range:
        data = store.get(key)
        if data is None:
            raise FileNotFoundError(missing or key)
        yield from sliced(data, 0)
        return
    pos = 0
    while True:
        b = store.get_range(key, pos, chunk_size)
        if b is None:
            raise FileNotFoundError(missing or key)
        if b:
            yield b
        if len(b) < chunk_size:
            return
        pos += len(b)
        if store.ranges_degraded(key):
            # the backend just LEARNED this host ignores Range headers
            # (each "ranged" read was a whole-object download): switch
            # to one whole get for the remainder — total transfer is
            # bounded at ~2x the object instead of N_chunks x object
            data = store.get(key)
            if data is None:
                raise FileNotFoundError(missing or key)
            yield from sliced(data, pos)
            return


def discover_shards(
    store,
    key: str,
    path: str,
    files: list[str] | None,
    manifest: list[str] | None,
    suffixes: tuple[str, ...],
) -> list[str]:
    """The shard-set cascade every shard reader shares: explicit
    ``files`` override first, else the sidecar ``manifest`` the caller
    already parsed, else a directory listing. An empty-but-present
    manifest (or ``files=[]``) is a valid zero-row dataset; only failed
    *discovery* — a listing that finds nothing — raises."""
    shard_names = files if files is not None else manifest
    if shard_names is None:  # discovery: foreign dir without a sidecar
        shard_names = sorted(
            n for n in store.list_dir(key) if n.endswith(suffixes)
        )
        if not shard_names:
            raise FileNotFoundError(
                f"no {'/'.join(suffixes)} shards under {path!r}"
            )
    return shard_names


def shard_read_partitions(spark, n_shards: int) -> int:
    """Read-side task count for a shard listing: one task per shard, up
    to the cluster's core count (floor 64 so a small local session still
    overlaps its network-bound GETs).  Each read task streams its shards
    *sequentially*, so a constant cap would serialize the ingest leg of a
    100k-shard corpus onto a handful of streams no matter how many
    executors exist — size by ``defaultParallelism`` like the NetCDF and
    Zarr chunk readers do."""
    return max(1, min(n_shards, max(64, spark.sparkContext.defaultParallelism)))


def resolve(path: str) -> tuple[Store, str]:
    """Path → (backend, backend-local key). Plain paths → local FS."""
    if path.startswith("mem://"):
        name, _, rest = path[len("mem://"):].partition("/")
        return memory_store(name), rest
    if path.startswith("http://"):
        return _HTTP, path[len("http://"):]
    if path.startswith("https://"):
        return _HTTPS, path[len("https://"):]
    return _FS, path


def join(path: str, *parts: str) -> str:
    """'/'-join that preserves URL schemes (os.path.join is fs-only)."""
    out = path.rstrip("/")
    for p in parts:
        out = f"{out}/{p.strip('/')}" if out else p.strip("/")
    return out


def list_tree(path: str) -> list[str]:
    """Every blob key under ``path``, as '/'-relative names, discovered
    through the Store seam (``list_dir`` of a blob is [], of a prefix its
    children — so a name is a blob iff it has no children)."""
    store, root = resolve(path)
    out: list[str] = []

    def walk(rel: str) -> None:
        key = f"{root}/{rel}" if rel else root
        children = store.list_dir(key)
        if not children:
            if store.get(key) is not None:
                out.append(rel)
            return
        for c in children:
            walk(f"{rel}/{c}" if rel else c)

    walk("")
    return sorted(out)


def copy_tree(src: str, dst: str, width: int = 128) -> int:
    """Copy every blob under ``src`` to the same relative key under
    ``dst``, ``width`` puts in flight (reference ``zarr.py:462-513``:
    stage the store skeleton locally, then a 128-thread copy — dozens of
    tiny metadata objects are pure request latency on an object store).
    Returns the number of blobs copied."""
    from xarray_beam_spark.sources import iothread

    src_store, src_root = resolve(src)
    dst_store, dst_root = resolve(dst)
    rels = list_tree(src)
    if not (
        getattr(dst_store, "latency_bound", False)
        or getattr(src_store, "latency_bound", False)
    ):
        width = 1  # local-to-local: threading is pure overhead (a
        # latency-bound side — EITHER side — is what the pool overlaps)

    def copy_one(rel: str) -> None:
        data = src_store.get(f"{src_root}/{rel}" if rel else src_root)
        assert data is not None, rel
        dst_store.put(f"{dst_root}/{rel}" if rel else dst_root, data)

    iothread.thread_map(copy_one, rels, width)
    return len(rels)
