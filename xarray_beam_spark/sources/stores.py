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
    """Byte-blob store interface (see module docstring)."""

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def put(self, key: str, data: bytes) -> None:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def list_dir(self, key: str) -> list[str]:
        raise NotImplementedError


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
        return any(b.startswith(prefix) for b in self.blobs) if prefix else bool(self.blobs)

    def list_dir(self, key: str) -> list[str]:
        k = self._norm(key)
        prefix = f"{k}/" if k else ""
        children = {b[len(prefix):].split("/", 1)[0] for b in self.blobs if b.startswith(prefix)}
        return sorted(children)


class HttpStore(Store):
    """Read-only object-store backend over plain HTTP(S) GETs — the
    minimal cloud seam (the reference reaches S3/GCS through fsspec,
    ``zarr.py:374-386``; fsspec is absent here, and S3/GCS auth aside,
    their read path IS ranged/plain GETs over HTTP).

    Semantics: ``get`` = one GET (404/410 → None = missing chunk →
    fill_value, like a missing file); ``exists`` = HEAD with GET
    fallback; ``list_dir`` returns [] — object stores have no cheap
    native listing either, which is exactly why zarr grew consolidated
    metadata: ``open_group`` reads ``.zmetadata`` in ONE request and
    never lists. ``put`` raises (publishing is the owning pipeline's
    job; a writable backend would implement the same four methods).

    ``latency_bound = True`` switches chunk IO to the threaded path
    (``iothread.thread_map``) — per-request latency, not bandwidth, is
    what dominates remote small-object reads."""

    latency_bound = True

    def __init__(self, scheme: str) -> None:
        self.scheme = scheme
        self._local = threading.local()  # per-thread keep-alive conns

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

    def _request(self, method: str, key: str) -> tuple[int, bytes]:
        """One keep-alive request; a fresh TCP(+TLS) handshake per chunk
        would double the very per-request latency the threaded IO path
        exists to hide. Connections are per-thread (http.client is not
        thread-safe) and retried once on a stale/broken socket."""
        import http.client
        from urllib.parse import quote

        netloc, _, path = key.partition("/")
        path = "/" + quote(path)
        last: Exception | None = None
        for attempt in (0, 1):
            conn = self._conn(netloc)
            try:
                conn.request(method, path)
                resp = conn.getresponse()
                body = resp.read()  # drain so the connection is reusable
                return resp.status, body
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

    def put(self, key: str, data: bytes) -> None:
        raise NotImplementedError(
            f"HttpStore is read-only; cannot PUT {self._url(key)}"
        )

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
