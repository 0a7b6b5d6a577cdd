"""xarray_beam_spark — a PySpark-native chunked N-d array analytics engine.

Re-expresses the capabilities of google/xarray-beam (distributed chunked
xarray Datasets over Apache Beam) on top of the Spark DataFrame engine:

- a distributed *Dataset* of keyed N-d array chunks carried as one
  chunk-row per Spark DataFrame row (binary ndarray payloads over Arrow),
- chunk planning / rechunking math (multistage shuffle plans),
- per-chunk vectorized compute via ``mapInPandas`` / ``applyInPandas``,
- combiner-style distributed aggregations (mean/sum/min/max/std/var),
- Zarr-format persistent storage (self-contained v2-compatible codec),
- a long/tabular bridge (``Dataset.from_table`` / ``Dataset.to_table``)
  so the full Spark SQL surface (joins, windows, set-ops) applies,
- large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search,
  text analysis, and multimodal binary-column plumbing.

No code is copied from the reference; reference files are cited in
docstrings as ``xarray_beam/_src/<file>.py:<lines>`` for parity checks.

The public surface is re-exported LAZILY (PEP 562 module ``__getattr__``):
importing ANY submodule executes this ``__init__`` first, and an eager
re-export block made every such import — each executor worker's first
task that unpickles a closure referencing a package helper, every
driver-side tool — pay the full compat/dataset/zarr_io chain whether or
not its path uses it (see ``_lazy.py`` for the measured boundaries).
Every name below resolves exactly as before on first attribute access.
"""

from __future__ import annotations

import importlib
from typing import Any

# Every reference top-level name is importable here: either natively
# (Key, Dataset, normalize_chunks, offsets_to_slices, setup_zarr,
# replace_template_dims, in_memory_rechunk, and the per-chunk free
# functions split_chunks / split_variables / consolidate_chunks /
# consolidate_variables / consolidate_fully for custom mapInPandas
# pipelines) or as a pipeable Beam-style shim from compat.py
# (`ds | Rechunk(...) | Mean('time')` — see that module's docstring for
# the two names deliberately NOT shimmed: MeanCombineFn and the
# per-element validate_chunk DoFn, whose checks run inside
# Dataset.validate / to_zarr). tests/test_core_math.py pins the
# import-parity list against the reference `__init__.py`.
_EXPORTS: dict[str, str] = {
    # Beam-style migration shims
    "ChunksToZarr": "xarray_beam_spark.compat",
    "ConsolidateChunks": "xarray_beam_spark.compat",
    "ConsolidateVariables": "xarray_beam_spark.compat",
    "DatasetToChunks": "xarray_beam_spark.compat",
    "DatasetToZarr": "xarray_beam_spark.compat",
    "Mean": "xarray_beam_spark.compat",
    "Rechunk": "xarray_beam_spark.compat",
    "SplitChunks": "xarray_beam_spark.compat",
    "SplitVariables": "xarray_beam_spark.compat",
    "ValidateEachChunk": "xarray_beam_spark.compat",
    "make_template": "xarray_beam_spark.compat",
    "open_zarr": "xarray_beam_spark.compat",
    "validate_zarr_chunk": "xarray_beam_spark.compat",
    "write_chunk_to_zarr": "xarray_beam_spark.compat",
    # core key/chunk math
    "Key": "xarray_beam_spark.core",
    "dask_to_xbeam_chunks": "xarray_beam_spark.core",
    "normalize_chunks": "xarray_beam_spark.core",
    "offsets_to_slices": "xarray_beam_spark.core",
    # the distributed Dataset
    "Dataset": "xarray_beam_spark.dataset",
    "Template": "xarray_beam_spark.dataset",
    "concat": "xarray_beam_spark.dataset",
    "consolidate_chunks": "xarray_beam_spark.dataset",
    "consolidate_fully": "xarray_beam_spark.dataset",
    "consolidate_variables": "xarray_beam_spark.dataset",
    "in_memory_rechunk": "xarray_beam_spark.dataset",
    "split_chunks": "xarray_beam_spark.dataset",
    "split_variables": "xarray_beam_spark.dataset",
    # in-memory N-d dataset
    "NDDataset": "xarray_beam_spark.ndarray_ds",
    "Variable": "xarray_beam_spark.ndarray_ds",
    # temporal joins
    "asof_join": "xarray_beam_spark.operators.temporal",
    "interval_join": "xarray_beam_spark.operators.temporal",
    # Zarr IO (importing the module also wires Dataset.to_zarr/from_zarr)
    "append_to_zarr": "xarray_beam_spark.sources.zarr_io",
    "from_zarr": "xarray_beam_spark.sources.zarr_io",
    "open_zarr_template": "xarray_beam_spark.sources.zarr_io",
    "replace_template_dims": "xarray_beam_spark.sources.zarr_io",
    "setup_zarr": "xarray_beam_spark.sources.zarr_io",
    "to_zarr": "xarray_beam_spark.sources.zarr_io",
}

__version__ = "0.1.0"


def __getattr__(name: str) -> Any:
    mod = _EXPORTS.get(name)
    if mod is None:
        # `xbs.dataset`-style submodule access used to work as a side
        # effect of the eager re-exports; keep it working lazily
        try:
            return importlib.import_module(f"{__name__}.{name}")
        except ImportError:
            raise AttributeError(
                f"module {__name__!r} has no attribute {name!r}"
            ) from None
    obj = getattr(importlib.import_module(mod), name)
    globals()[name] = obj  # cache: next access skips __getattr__
    return obj


def __dir__() -> list[str]:
    return sorted(set(globals()) | set(_EXPORTS))
