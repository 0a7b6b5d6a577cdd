"""Ship the xarray_beam_spark package to Spark executors.

UDF closures reference this package's module-level functions; cloudpickle
serializes those *by reference*, so executor Python workers must be able to
``import xarray_beam_spark`` regardless of the driver process's cwd. We zip
the package once and register it with ``SparkContext.addPyFile`` —
idempotent per context.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_xbs_package_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.mkdtemp(prefix="xbs_pyfiles_"), "xarray_beam_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, _FLAG, True)
