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
"""

from xarray_beam_spark.compat import (  # noqa: F401  (Beam-style migration shims)
    ChunksToZarr,
    ConsolidateChunks,
    ConsolidateVariables,
    DatasetToChunks,
    DatasetToZarr,
    Mean,
    Rechunk,
    SplitChunks,
    SplitVariables,
    ValidateEachChunk,
    make_template,
    open_zarr,
    validate_zarr_chunk,
    write_chunk_to_zarr,
)
from xarray_beam_spark.core import (  # noqa: F401
    Key,
    dask_to_xbeam_chunks,
    normalize_chunks,
    offsets_to_slices,
)
from xarray_beam_spark.dataset import (  # noqa: F401
    Dataset,
    Template,
    concat,
    consolidate_chunks,
    consolidate_fully,
    consolidate_variables,
    in_memory_rechunk,
    split_chunks,
    split_variables,
)
from xarray_beam_spark.ndarray_ds import NDDataset, Variable  # noqa: F401
from xarray_beam_spark.operators.temporal import asof_join, interval_join  # noqa: F401
from xarray_beam_spark.sources import zarr_io as _zarr_io  # noqa: F401  (wires Dataset.to_zarr/from_zarr)
from xarray_beam_spark.sources.zarr_io import (  # noqa: F401
    append_to_zarr,
    from_zarr,
    open_zarr_template,
    replace_template_dims,
    setup_zarr,
    to_zarr,
)

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

__version__ = "0.1.0"
