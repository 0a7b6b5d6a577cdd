"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {"q1": sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xarray_beam_spark import registry
from xarray_beam_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("xbs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    # Warm the JVM + parquet footers once with the cheapest query.
    try:
        qs["q6_revenue_change"](spark, sf_dir).collect()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count() if hasattr(df, "count") else 0
            _ = n
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # record failures as negative sentinel
            timings[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
