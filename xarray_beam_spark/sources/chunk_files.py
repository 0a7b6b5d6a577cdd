"""Per-chunk file sink/source: the reference's "netCDF file per chunk"
pattern, Spark-first.

The reference's docs (``docs/read-write.ipynb``) show writing one netCDF
file per chunk with a custom Beam DoFn and reading them back with a
custom loader; no netCDF library exists in this container, so the
per-chunk container is the engine's own self-describing XBS1 codec
(``codec.py``: JSON header + raw C-order buffers — same role netCDF
plays in the reference docs) and the collection container is Parquet:
one row per chunk, offsets as ordinary columns, the chunk as a binary
cell.

Why Parquet instead of N loose files: the write is Spark's native
distributed parquet sink (atomic task commit, object-store ready via
the Hadoop FS layer), the read-back is an ordinary parquet scan whose
offset columns Catalyst can prune with pushed-down predicates — so a
windowed re-read touches only matching row groups, the same effect the
Zarr path gets from region math. At 100 TB: no driver participation in
either direction beyond one tiny template sidecar.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from xarray_beam_spark.codec import decode_chunk, encode_chunk
from xarray_beam_spark.dataset import Dataset, Template
from xarray_beam_spark.ndarray_ds import NDDataset
from xarray_beam_spark.sources import stores

_META_NAME = "_xbs_meta.json"
_TEMPLATE_NAME = "_xbs_template.xbs"


def to_chunk_parquet(ds: Dataset, path: str, mode: str = "error") -> None:
    """Write every chunk row as parquet + a driver-side template sidecar.

    The data path is ``ds.df.write.parquet`` — fully distributed, no
    shuffle (chunk rows are written where they live). The sidecar holds
    the virtual-dataset schema (sizes/var dtypes/attrs) and the
    materialized coordinates, encoded with the same chunk codec.
    """
    data_dir = os.path.join(path, "chunks")
    ds.df.write.mode(mode).parquet(data_dir)
    store, key = stores.resolve(path)
    meta = {
        "sizes": dict(ds.template.sizes),
        "var_meta": {k: [list(dims), dt] for k, (dims, dt) in ds.template.var_meta.items()},
        "chunks": dict(ds.chunks),
        "split_vars": ds.split_vars,
        "format": "xbs-chunk-parquet-v1",
    }
    store.put(stores.join(key, _META_NAME), json.dumps(meta, sort_keys=True).encode())
    coords_ds = NDDataset({}, dict(ds.template.coords), dict(ds.template.attrs))
    store.put(stores.join(key, _TEMPLATE_NAME), encode_chunk(coords_ds))


def from_chunk_parquet(
    spark: SparkSession, path: str, validate: bool = False
) -> Dataset:
    """Re-open a ``to_chunk_parquet`` collection as a lazy Dataset.

    One sidecar read on the driver; the chunk payloads stay in parquet
    until an action, behind a scan Catalyst can filter on the offset
    columns (predicate pushdown into row groups).
    """
    store, key = stores.resolve(path)
    raw = store.get(stores.join(key, _META_NAME))
    if raw is None:
        raise FileNotFoundError(f"no {_META_NAME} under {path!r}")
    meta = json.loads(raw.decode())
    if meta.get("format") != "xbs-chunk-parquet-v1":
        raise ValueError(f"unrecognized chunk-parquet format: {meta.get('format')!r}")
    coords_raw = store.get(stores.join(key, _TEMPLATE_NAME))
    coords_ds = decode_chunk(coords_raw) if coords_raw is not None else NDDataset({}, {})
    template = Template(
        sizes={d: int(s) for d, s in meta["sizes"].items()},
        var_meta={k: (tuple(dims), dt) for k, (dims, dt) in meta["var_meta"].items()},
        coords=dict(coords_ds.coords),
        attrs=dict(coords_ds.attrs),
    )
    df = spark.read.parquet(os.path.join(path, "chunks"))
    return Dataset.from_dataframe(
        spark,
        df,
        template,
        {d: int(c) for d, c in meta["chunks"].items()},
        split_vars=bool(meta["split_vars"]),
        validate=validate,
    )
