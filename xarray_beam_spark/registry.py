"""Central query registry: merges every module's query/oracle tables.

``__spark_entry__.py`` (the driver contract) is a thin shim over this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _collect() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    merged: dict[str, tuple[Callable, str | None]] = {}
    import xarray_beam_spark.tabular as tabular

    # Module order IS the driver's evaluation order. The round-1 driver
    # stopped ~49 queries in (budget), leaving dedup/ANN/multimodal/stream
    # unchecked — so the newer operator families run before the grid suite
    # (whose queries share memoized inputs and were all green in round 1).
    modules = [tabular]
    for modname in (
        "xarray_beam_spark.functions.text",
        "xarray_beam_spark.operators.dedup",
        "xarray_beam_spark.operators.corpus",
        "xarray_beam_spark.operators.temporal",
        "xarray_beam_spark.operators.simsearch",
        "xarray_beam_spark.operators.multimodal",
        "xarray_beam_spark.streaming.events_stream",
        "xarray_beam_spark.grid_queries",
    ):
        try:
            mod = __import__(modname, fromlist=["REGISTRY"])
            modules.append(mod)
        except ImportError:
            continue
    for mod in modules:
        for name, entry in mod.REGISTRY.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r}")
            merged[name] = entry
    return merged


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from xarray_beam_spark.shipping import ensure_shipped

        ensure_shipped(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _collect().items() if sql is not None}
