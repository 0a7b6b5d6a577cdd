"""Empirical scale curves for the heavy LLM operators (VERDICT r12 #5).

The dedup trio (minhash_lsh / passjoin_exact / levenshtein_twins), one
ANN gate (ann_ivf_topk — the bucketed scale path), and one span-removal
gate (text_remove_dup_spans) all carry structural O(candidates) /
O(bucketed-join) claims that were never empirically scaled.  This
script measures wall time at 1x / 3x / 10x the sf0.1 documents and
embeddings tables and reports the fitted exponent
``log(t_hi / t_lo) / log(n_hi / n_lo)`` per query — a superlinear
surprise here is exactly what a 100x scale-up would hit.

Scaled inputs are DERIVED fixtures, not synthetic test data: each copy
k of a document keeps its text but gets a per-copy suffix token and a
doc_id offset, so copies are near-dup-distinct (exact duplication would
change the dedup workload into one giant duplicate cluster — a
different problem than scaling the real one).  Embeddings get a tiny
deterministic per-copy rotation for the same reason.  Other tables are
symlinked from sf0.1 unchanged.

Usage: python scripts/profile_scale.py [--factors 1,3,10] [--runs 2]
Prints one JSON line; the committed record is scripts/profile_scale_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_passjoin_exact",
    "dedup_levenshtein_twins",
    "ann_ivf_topk",
    "text_remove_dup_spans",
    "text_remove_dup_spans_chars",
    # r15: the end-to-end training funnel — the registry's most expensive
    # query and the closest proxy for the real 100 TB workload. Its
    # persistent WARC fixture digests the input directory's parquet
    # fingerprint, so each scaled dir builds (once) and reuses its own
    # factor-k corpus; run 2's min reads through the build like every
    # other fixture.
    "corpus_e2e_train_pipeline",
    # r16 (VERDICT item 6): four more families whose scale behavior the
    # bench can no longer distinguish at sf0.1
    "corpus_bloom_decontaminate",
    "corpus_clean_pipeline",
    "q9_nation_profit",
    "stream_zarr_append",
]


def scaled_dir(spark, factor: int, root: str) -> str:
    """Materialize a factor-x copy of sf0.1 under ``root`` (symlinks for
    unchanged tables; documents/embeddings rewritten scaled)."""
    out = os.path.join(root, f"sf0.1x{factor}")
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    for name in os.listdir(BASE):
        if name not in ("documents.parquet", "embeddings.parquet"):
            os.symlink(os.path.join(BASE, name), os.path.join(out, name))
    if factor == 1:
        for name in ("documents.parquet", "embeddings.parquet"):
            os.symlink(os.path.join(BASE, name), os.path.join(out, name))
        return out
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    copies = spark.range(factor).withColumnRenamed("id", "copy")
    # per-copy suffix token: copies are NEAR duplicates (the realistic
    # shingle/edit-distance workload), never exact
    suffixed = F.when(F.col("copy") == 0, F.col("text")).otherwise(
        F.concat_ws(" ", "text", F.concat(F.lit("c"), "copy"))
    )
    scaled = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * (2 * n_docs)).alias("doc_id"),
            suffixed.alias("text"),
            "lang",
            "source",
            # length of the SUFFIXED text: F.length("text") here would
            # resolve against the input column, leaving text/n_chars
            # inconsistent for copy>0 fixtures
            F.length(suffixed).cast("long").alias("n_chars"),
        )
    )
    scaled.repartition(32).write.parquet(os.path.join(out, "documents.parquet"))
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()
    scaled_emb = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * (2 * n_emb)).alias("vec_id"),
            # deterministic tiny perturbation: element i += copy * 1e-3 * sign(i odd)
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + F.col("copy").cast("float")
                    * F.lit(0.001)
                    * F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
                ).cast("float"),
                # cast back: the arithmetic widens to double, which would
                # make factor>1 fixtures scan 2x the bytes PER ELEMENT and
                # inflate the fitted exponent (a spurious superlinearity)
            ).alias("embedding"),
            "label",
        )
    )
    scaled_emb.repartition(32).write.parquet(os.path.join(out, "embeddings.parquet"))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,3,10")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    from xarray_beam_spark import registry
    from xarray_beam_spark.session import get_spark

    spark = get_spark("xbs-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    root = tempfile.mkdtemp(prefix="xbs_scale_")
    load0 = [round(x, 2) for x in os.getloadavg()]
    timings: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    # output rows per (query, factor): r16 addition — the r15 sweep's one
    # "superlinear" curve (passjoin 0.77) turned out to be quadratic OUTPUT
    # growth (the suffix-token copies leave its 24-char-prefix corpus
    # exactly duplicated, so true pairs grow ~factor² — measured 6 114 →
    # 1 061 400 rows from 1× to 10×), not engine skew. Recording rows next
    # to seconds keeps that distinction in the artifact.
    out_rows: dict[str, dict[int, int]] = {q: {} for q in QUERIES}
    try:
        for factor in factors:
            sf_dir = scaled_dir(spark, factor, root)
            for r in range(args.runs):
                if r > 0:
                    from xarray_beam_spark import grid_queries
                    from xarray_beam_spark.operators import dedup

                    grid_queries.reset_ephemeral_caches()
                    dedup.reset_ephemeral_caches()
                for q in QUERIES:
                    t0 = time.perf_counter()
                    # noop sink, NOT count(): count() lets Catalyst prune
                    # projections and aggregate expressions, so a
                    # row-preserving rewrite (the span family) never
                    # executes and its curve is a no-op's (bench.py's r13
                    # measurement fix applies here identically).
                    try:
                        qs[q](spark, sf_dir).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        t = time.perf_counter() - t0
                    except Exception as exc:  # noqa: BLE001 — keep the
                        # hours of timings already collected; -1 marks the
                        # failed (query, factor) like bench.py's sentinel
                        print(f"# scale error {q}@{factor}x: {exc}", file=sys.stderr)
                        t = -1.0
                    prev = timings[q].get(factor)
                    if t < 0 or (prev is not None and prev < 0):
                        timings[q][factor] = -1.0
                    else:
                        timings[q][factor] = t if prev is None else min(prev, t)
                    if r == args.runs - 1 and timings[q][factor] >= 0:
                        # output size for the curve record (untimed; after
                        # the timed runs so the count's fixture warmth
                        # cannot flatter the noop timing)
                        try:
                            out_rows[q][factor] = qs[q](spark, sf_dir).count()
                        except Exception:  # noqa: BLE001
                            out_rows[q][factor] = -1
    finally:
        shutil.rmtree(root, ignore_errors=True)

    lo, hi = factors[0], factors[-1]
    import math

    out = {
        "metric": "scale_curve",
        "action": "noop_sink_write",
        "base": BASE,
        "factors": factors,
        "runs": args.runs,
        "loadavg_start": load0,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "queries": {
            q: {
                "seconds": {str(f): round(t, 2) for f, t in timings[q].items()},
                # None when unfittable: single-point run, or a failed
                # endpoint (-1 sentinel)
                "exponent": (
                    round(
                        math.log(timings[q][hi] / timings[q][lo])
                        / math.log(hi / lo),
                        2,
                    )
                    if hi != lo and timings[q][lo] > 0 and timings[q][hi] > 0
                    else None
                ),
                "output_rows": {str(f): n for f, n in out_rows[q].items()},
            }
            for q in QUERIES
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
