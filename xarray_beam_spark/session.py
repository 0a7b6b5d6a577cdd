"""SparkSession factory tuned for chunked-array workloads.

Local testing runs ``local[N]``; the configuration is chosen so the same
logical plans scale to a multi-executor cluster: AQE on (runtime partition
coalescing + skew-join splitting), Arrow enabled for the pandas UDF surface,
and shuffle partition counts sized for the test scale factor while AQE
re-plans for larger inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "xarray-beam-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or min(os.cpu_count() or 4, 32)
    from xarray_beam_spark.shipping import runtime_sql_conf

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Chunk payloads are 10-100MB binary cells; keep Arrow batches small
        # in chunk-row stages (the engine also repartitions by bytes).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # local[N] runs the whole engine in the driver JVM: shuffle buffers
        # for chunk payloads + N concurrent Arrow streams need real heap,
        # or GC thrash dominates wide stages (machine has 128 GiB).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    # shared runtime-SQL table (see shipping.runtime_sql_conf): applied at
    # build time here, and by tune_session on vanilla/driver sessions
    for key, value in runtime_sql_conf(cpus):
        builder = builder.config(key, value)
    return builder.getOrCreate()
