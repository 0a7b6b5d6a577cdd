"""Dump .explain("formatted") for named registry queries to plans/<tag>/.

Usage:
  python scripts/explain_dump.py <tag> <suffix> q1,q2,...   # e.g. r15 before

Writes plans/<tag>/<query>_<suffix>.txt for each query. Query construction
may run eager fixture builds (memoized stores, bounded metadata collects) —
that is part of the declared query contract and is fine here; the dump
itself never executes the returned plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_beam_spark import registry
from xarray_beam_spark.session import get_spark


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = [n for n in sys.argv[3].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("xbs-explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"explain:{name}")
        df = qs[name](spark, sf_dir)
        if not hasattr(df, "_jdf"):
            print(f"# {name}: not a DataFrame, skipped", file=sys.stderr)
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
