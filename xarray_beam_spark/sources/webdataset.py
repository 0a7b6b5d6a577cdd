"""WebDataset tar shards: the standard multimodal training-data layout.

The reference (xarray-beam) has no sample-archive surface; this module
is part of the training-data-pipeline extension. WebDataset (the PUBLIC
convention used by open multimodal training stacks — plain POSIX tar
files whose members are named ``{key}.{ext}``, with all members of one
sample stored consecutively) is how image/text/audio corpora ship to
dataloaders: sequential tar reads give near-raw-IO throughput and a
shard is the unit of shuffling/parallelism.

Implementation is stdlib ``tarfile`` over the engine's ``stores``
backend (local fs / http / mem) — no webdataset package needed, the
format IS tar plus a naming convention:

* sample key = member name up to the FIRST dot of its basename
  (directory prefixes stay part of the key, multi-dot extensions like
  ``seg.png`` stay part of the extension),
* one column ↔ one extension; serialization is type-driven: ``binary``
  raw, ``string`` utf-8, anything else canonical JSON (sorted keys) so
  equal rows give identical bytes,
* tar metadata is pinned (USTAR, mtime=0, uid/gid=0, mode 0644) so
  shard bytes are deterministic — idempotent task retries rewrite the
  identical object.

Scale shape mirrors ``tfrecord.py``: the writer is ``mapInArrow`` with
one shard object per ``shard_records`` slice of each input partition
(zero shuffle, no driver participation beyond the schema sidecar); the
reader takes the shard set from the sidecar's manifest (one GET; no
listing needed), parallelizes it, and each task opens only its shards.
Arrow rather than pandas is load-bearing: pandas widens a null-bearing
int64 column to float64, which would corrupt 2^53+ values and serialize
NULL as a literal ``NaN`` JSON member. The WRITER holds one shard in
memory while building (bounded by ``shard_records``); the READER is
bounded-memory regardless of shard size — ranged GETs feed tarfile's
stream mode and samples leave as ~64 MB RecordBatch flushes, so a
foreign multi-GB tar costs O(member + batch), never O(shard). The
reader rejects malformed shards loudly
(member before any key, duplicate extension within a sample) rather
than guessing.
"""

from __future__ import annotations

import io
import json
import tarfile
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from xarray_beam_spark.sources import bytestream, stores

KEY_COL = "__key__"
_META_NAME = "_xbs_wds_meta.json"


def _serializer(field: T.StructField):
    dt = field.dataType
    if isinstance(dt, T.BinaryType):
        return lambda v: bytes(v)
    if isinstance(dt, T.StringType):
        return lambda v: v.encode()
    # canonical JSON for everything else — Arrow's to_pylist hands over
    # plain python ints/floats/bools/lists/dicts, so int64 stays exact
    # (the pandas path would widen a null-bearing long column to float64
    # and serialize 5 as "5.0" or a NULL as literal NaN)
    def to_json(v):
        return json.dumps(v, sort_keys=True, separators=(",", ":")).encode()

    return to_json


def _deserializer(field: T.StructField):
    dt = field.dataType
    if isinstance(dt, T.BinaryType):
        return lambda b: b
    if isinstance(dt, T.StringType):
        return lambda b: b.decode()
    return lambda b: json.loads(b.decode())


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def split_member_name(name: str) -> tuple[str, str]:
    """``dir/base.seg.png`` → (``dir/base``, ``seg.png``) — key is up to
    the first dot of the BASENAME (webdataset convention)."""
    slash = name.rfind("/")
    dot = name.find(".", slash + 1)
    if dot < 0:
        raise ValueError(f"tar member {name!r} has no extension")
    return name[:dot], name[dot + 1 :]


_WRITE_STATS, _WRITE_STATS_PA = stores.write_stats_schemas("samples")


def write_webdataset(
    df: DataFrame,
    path: str,
    *,
    key_col: str = KEY_COL,
    ext_map: dict[str, str] | None = None,
    shard_records: int | None = None,
    _shard_prefix: str = "part",
    _merge_manifest: bool = False,
) -> dict:
    """Write a DataFrame as WebDataset tar shards.

    ``key_col`` supplies each sample's key (string; '/' allowed for
    subdir keys, dots forbidden — they would shift the key/extension
    split on read). Every other column becomes one member per sample,
    named ``{key}.{ext}`` with ``ext = ext_map.get(col, col)``. NULL
    cells write no member (missing leg of a sample — the convention's
    own sparse-sample idiom); NULL keys and all-NULL samples are
    rejected loudly (a sample with zero members has no tar
    representation and would silently vanish on read). Shards are
    ``part-{partition:05d}-{seq:04d}.tar``. Returns
    ``{"shards": n, "samples": n, "bytes": n}``.
    """
    stores.assert_executor_reachable(path, "write_webdataset")
    fields = [f for f in df.schema.fields if f.name != key_col]
    if key_col not in df.columns:
        raise ValueError(f"key column {key_col!r} not in DataFrame")
    if not isinstance(df.schema[key_col].dataType, T.StringType):
        raise TypeError(f"key column {key_col!r} must be string")
    ext_map = ext_map or {}
    exts = {f.name: ext_map.get(f.name, f.name) for f in fields}
    if len(set(exts.values())) != len(exts):
        raise ValueError(f"extension collision in {sorted(exts.values())}")
    sers = {f.name: _serializer(f) for f in fields}
    # members of a sample are written in sorted-extension order so shard
    # bytes are deterministic regardless of column order
    ordered = sorted(fields, key=lambda f: exts[f.name])
    schema_json = df.schema.json()

    def write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        store, key = stores.resolve(path)
        pid = TaskContext.get().partitionId()
        names: list[str] = []
        seq = n_samples = n_bytes = 0
        buf = io.BytesIO()
        tar = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
        in_shard = 0
        # ALL keys this task has written, not just the previous one:
        # two same-key rows separated by another key within a partition
        # are just as unreadable (non-consecutive reuse fails the
        # reader), and if they straddle a shard boundary the reader
        # would silently yield two samples with one key.  Memory is
        # bounded by rows per task.
        written_keys: set[str] = set()

        def flush() -> None:
            nonlocal seq, n_bytes, buf, tar, in_shard
            tar.close()
            if in_shard == 0:
                buf = io.BytesIO()
                tar = tarfile.open(
                    fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
                )
                return
            blob = buf.getvalue()
            name = f"{_shard_prefix}-{pid:05d}-{seq:04d}.tar"
            store.put(stores.join(key, name), blob)
            names.append(name)
            seq += 1
            n_bytes += len(blob)
            buf = io.BytesIO()
            tar = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
            in_shard = 0

        for batch in batches:
            # Arrow (not pandas) is load-bearing: to_pylist keeps
            # null-bearing int64 columns exact (pandas would widen to
            # float64 → "5.0"/"NaN" JSON members, corrupt 2^53+ values)
            keys = batch.column(batch.schema.get_field_index(key_col)).to_pylist()
            cols = {
                f.name: batch.column(
                    batch.schema.get_field_index(f.name)
                ).to_pylist()
                for f in fields
            }
            for i in range(batch.num_rows):
                k = keys[i]
                if k is None:
                    raise ValueError("NULL sample key")
                if "." in k.rsplit("/", 1)[-1]:
                    raise ValueError(
                        f"sample key {k!r} contains '.', which would shift "
                        "the key/extension split on read"
                    )
                if k in written_keys:
                    # the read convention merges consecutive same-key
                    # members into ONE sample, so two rows sharing a key
                    # would silently collapse (or, with overlapping
                    # columns, write a shard every read rejects) — and
                    # whether they even land adjacent depends on shard
                    # flush boundaries. Refuse at the source.
                    raise ValueError(
                        f"duplicate sample key {k!r} in one partition; "
                        "webdataset keys must be unique — two rows with "
                        "one key cannot round-trip as two samples"
                    )
                written_keys.add(k)
                wrote_member = False
                for f in ordered:
                    v = cols[f.name][i]
                    if v is None:
                        continue
                    data = sers[f.name](v)
                    member = f"{k}.{exts[f.name]}"
                    try:
                        tar.addfile(
                            _tarinfo(member, len(data)), io.BytesIO(data)
                        )
                    except ValueError as e:
                        # tarfile's bare "name is too long" names neither
                        # the row nor the USTAR limit
                        raise ValueError(
                            f"sample key {k!r}: tar member {member!r} "
                            f"exceeds the USTAR name limit (~100 chars, "
                            f"or 155+100 split at a '/'): {e}"
                        ) from None
                    wrote_member = True
                if not wrote_member:
                    raise ValueError(
                        f"sample {k!r} has every member column NULL — no tar "
                        "representation exists and it would silently vanish "
                        "on read; filter such rows out (or add a non-NULL "
                        "member) before writing"
                    )
                n_samples += 1
                in_shard += 1
                if shard_records and in_shard >= shard_records:
                    flush()
        flush()
        yield pa.RecordBatch.from_pydict(
            {
                "shards": [len(names)],
                "samples": [n_samples],
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
        {
            "format": "xbs-webdataset-v1",
            "schema": json.loads(schema_json),
            "key_col": key_col,
            "ext_map": exts,
        },
        _merge_manifest,
    )


def read_webdataset(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    key_col: str = KEY_COL,
    ext_map: dict[str, str] | None = None,
    files: list[str] | None = None,
    batch_bytes: int | None = None,
) -> DataFrame:
    """Read WebDataset tar shards back into a DataFrame.

    With ``schema=None`` the writer's sidecar supplies schema, key
    column, and extension map — foreign tars need an explicit schema
    (key column must be string; other columns decode by type: binary
    raw, string utf-8, else JSON). Missing members decode as NULL;
    extensions not mapped to any column are ignored. Sample boundaries
    follow the convention: a sample is the run of consecutive members
    sharing a key (non-consecutive reuse of a key is a malformed shard
    and fails loudly, as does a duplicate extension within a sample).

    ``files`` overrides shard discovery with an explicit relative-name
    list (foreign, sidecar-less shard sets on listing-less stores);
    pair it with an explicit ``schema`` unless a sidecar exists. An
    empty-but-present manifest reads back as zero rows — only failed
    *discovery* raises. ``batch_bytes`` caps the per-flush RecordBatch
    payload (default ~64 MB) — per-task memory is O(member + batch),
    not O(shard).
    """
    stores.assert_executor_reachable(path, "read_webdataset")
    store, skey = stores.resolve(path)
    manifest: list[str] | None = None
    raw = store.get(stores.join(skey, _META_NAME))
    if raw is not None:
        meta = json.loads(raw.decode())
        if meta.get("format") != "xbs-webdataset-v1":
            raise ValueError(f"unrecognized sidecar format {meta.get('format')!r}")
        manifest = meta.get("shards")
        if schema is None:
            schema = T.StructType.fromJson(meta["schema"])
            key_col = meta["key_col"]
            ext_map = meta["ext_map"]
    if schema is None:
        raise FileNotFoundError(
            f"no schema given and no {_META_NAME} sidecar under {path!r}"
        )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if key_col not in schema.fieldNames():
        # mirror of the writer's plan-time check: without it an explicit
        # schema lacking the key column dies as a bare KeyError deep
        # inside an executor task
        raise ValueError(
            f"key column {key_col!r} not in schema {schema.fieldNames()}; "
            "webdataset samples are keyed — include it (string)"
        )
    if not isinstance(schema[key_col].dataType, T.StringType):
        raise TypeError(f"key column {key_col!r} must be string")
    fields = [f for f in schema.fields if f.name != key_col]
    wanted = [(ext_map or {}).get(f.name, f.name) for f in fields]
    if len(set(wanted)) != len(wanted):
        # mirror the writer's check: a dict build would silently keep
        # only the LAST column per extension, decoding the other as
        # all-NULL with no error
        raise ValueError(f"extension collision in {sorted(wanted)}")
    exts = {ext: f.name for ext, f in zip(wanted, fields)}
    desers = {f.name: _deserializer(f) for f in fields}
    shard_names = stores.discover_shards(
        store, skey, path, files, manifest, (".tar",)
    )
    from pyspark.sql.pandas.types import to_arrow_schema

    pa_schema = to_arrow_schema(schema)

    def read(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        store, skey = stores.resolve(path)
        # bounded-memory leg (same shape as the WARC/TFRecord readers):
        # ranged-GET chunks feed tarfile's non-seeking STREAM mode
        # ("r|" — members are read strictly forward, never the whole
        # tar), and decoded samples leave as ~64 MB RecordBatch flushes.
        # Per-task memory is O(member + batch), independent of shard
        # size.
        bb = bytestream.BatchBuilder(pa_schema, batch_bytes)
        for batch in batches:
            for shard in batch.column(0).to_pylist():
                chunks = stores.iter_blob(
                    store,
                    stores.join(skey, shard),
                    missing=f"shard {shard!r} vanished under {path!r}",
                )
                seen_keys: set[str] = set()
                cur: str | None = None
                sample: dict[str, object] = {}
                sample_bytes = 0

                def emit() -> Iterator[pa.RecordBatch]:
                    if cur is None:
                        return
                    bb.rows[key_col].append(cur)
                    for f in fields:
                        bb.rows[f.name].append(sample.get(f.name))
                    yield from bb.note(sample_bytes)

                with tarfile.open(
                    fileobj=bytestream.reader(chunks), mode="r|*"
                ) as tar:
                    for member in tar:
                        if not member.isfile():
                            continue
                        k, ext = split_member_name(member.name)
                        if k != cur:
                            if k in seen_keys:
                                raise ValueError(
                                    f"{shard}: sample key {k!r} is not "
                                    "consecutive — malformed shard"
                                )
                            yield from emit()
                            seen_keys.add(k)
                            cur = k
                            sample = {}
                            sample_bytes = 0
                        col = exts.get(ext)
                        if col is None:
                            continue
                        if col in sample:
                            raise ValueError(
                                f"{shard}: duplicate member {member.name!r}"
                            )
                        data = tar.extractfile(member).read()
                        sample_bytes += len(data)
                        sample[col] = desers[col](data)
                    yield from emit()
        yield bb.final()

    shards = spark.createDataFrame(
        [(s,) for s in shard_names], "shard string"
    ).repartition(stores.shard_read_partitions(spark, len(shard_names)))
    return shards.mapInArrow(read, schema)


def webdataset_stream_sink(
    path: str,
    *,
    key_col: str = KEY_COL,
    ext_map: dict[str, str] | None = None,
    shard_records: int | None = None,
):
    """``foreachBatch`` callback: exactly-once streaming WebDataset export.

    Mirror of ``tfrecord.tfrecord_stream_sink``: per-batch shard
    prefixes, manifest grown per batch, batch-id high-water marker next
    to the directory, loud refusal on schema drift between batches.
    """
    stores.assert_executor_reachable(path, "webdataset_stream_sink")
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_webdataset(
            batch_df,
            path,
            key_col=key_col,
            ext_map=ext_map,
            shard_records=shard_records,
            _shard_prefix=f"batch-{batch_id:06d}",
            _merge_manifest=True,
        )

    return stores.exactly_once_batch_sink(path, write_batch)
