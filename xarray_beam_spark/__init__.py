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

from xarray_beam_spark.core import Key  # noqa: F401
from xarray_beam_spark.dataset import Dataset, Template, concat  # noqa: F401
from xarray_beam_spark.ndarray_ds import NDDataset, Variable  # noqa: F401
from xarray_beam_spark.operators.temporal import asof_join, interval_join  # noqa: F401
from xarray_beam_spark.sources import zarr_io as _zarr_io  # noqa: F401  (wires Dataset.to_zarr/from_zarr)
from xarray_beam_spark.sources.zarr_io import from_zarr, to_zarr  # noqa: F401

__version__ = "0.1.0"
