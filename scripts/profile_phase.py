"""Per-query phase profiler: split plan-construction time (eager fixture
jobs, bounded metadata collects) from noop-sink execution time.

Usage: python scripts/profile_phase.py q1,q2,...   [repeats]

Mirrors bench.py methodology (same session, q6 warm-up, ephemeral-cache
resets between repeats) but reports construct/noop separately so the
optimization effort lands on the phase that actually costs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_beam_spark import registry
from xarray_beam_spark.session import get_spark


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("xbs-phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    try:
        qs["q6_revenue_change"](spark, sf_dir).collect()
    except Exception:
        pass
    out: dict[str, tuple[float, float]] = {}
    for r in range(repeats):
        if r > 0:
            from xarray_beam_spark import grid_queries
            from xarray_beam_spark.operators import dedup

            grid_queries.reset_ephemeral_caches()
            dedup.reset_ephemeral_caches()
        for name in names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            if hasattr(df, "write"):
                df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            tc, tn = t1 - t0, t2 - t1
            prev = out.get(name)
            if prev is None or tc + tn < sum(prev):
                out[name] = (tc, tn)
            print(
                f"run{r} {name}: construct={tc:.2f}s noop={tn:.2f}s",
                file=sys.stderr,
            )
    print("query,construct_s,noop_s")
    for name in names:
        tc, tn = out[name]
        print(f"{name},{tc:.2f},{tn:.2f}")


if __name__ == "__main__":
    main()
