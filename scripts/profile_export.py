"""Trainer-export-leg throughput: TFRecord and WebDataset sinks/sources.

Same spirit as ``throughput.py``'s 2 GB protocol: synthesize an
incompressible document corpus of a target size, then measure the four
distributed legs — TFRecord write/read and WebDataset write/read — as
end-to-end Spark jobs (serialize + crc/tar + store puts, and the
reverse). Reported MB/s is payload bytes (sum of document text sizes)
over wall time, so the framing/packaging overhead is inside the number.

Usage: python scripts/profile_export.py [--mb 512] [--cpus N]
Prints one JSON line.
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

from pyspark.sql import functions as F

from xarray_beam_spark.session import get_spark
from xarray_beam_spark.sources import tfrecord, webdataset


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--doc-kb", type=int, default=8, help="text size per doc")
    args = ap.parse_args()

    spark = get_spark("xbs-export-profile", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from xarray_beam_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    cores = spark.sparkContext.defaultParallelism

    doc_bytes = args.doc_kb * 1024
    n_docs = (args.mb * (1 << 20)) // doc_bytes
    # deterministic per-doc text: every 32-byte block is the md5 of a
    # (doc, block) pair, so no block repeats (hex, so ~4 bits/char of
    # entropy — "hard to compress", not incompressible). Generated as
    # JVM expressions and materialized via persist() BEFORE timing, so
    # generation cost never leaks into the measured legs.
    reps = doc_bytes // 32
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(1), F.lit(reps)),
                    lambda i: F.md5(
                        F.concat(F.col("id").cast("string"), F.lit("-"), i.cast("string"))
                    ),
                ),
            ).alias("text"),
        )
        .repartition(cores * 2)
        .persist()
    )
    payload = docs.agg(F.sum(F.octet_length("text"))).collect()[0][0]
    out = {
        "metric": "export_leg_throughput",
        "payload_mb": round(payload / (1 << 20), 1),
        "docs": n_docs,
        "cores": cores,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }

    base = tempfile.mkdtemp(prefix="xbs_export_prof_")
    try:
        t0 = time.monotonic()
        tfrecord.write_tfrecords(docs, f"{base}/tfr", shard_records=2048)
        out["tfrecord_write_mbps"] = round(payload / (1 << 20) / (time.monotonic() - t0), 1)

        t0 = time.monotonic()
        n = tfrecord.read_tfrecords(spark, f"{base}/tfr").count()
        assert n == n_docs, (n, n_docs)
        out["tfrecord_read_mbps"] = round(payload / (1 << 20) / (time.monotonic() - t0), 1)

        wds_in = docs.select(
            F.format_string("%012d", "doc_id").alias(webdataset.KEY_COL),
            F.col("text").alias("txt"),
        )
        t0 = time.monotonic()
        webdataset.write_webdataset(wds_in, f"{base}/wds", shard_records=2048)
        out["wds_write_mbps"] = round(payload / (1 << 20) / (time.monotonic() - t0), 1)

        t0 = time.monotonic()
        n = webdataset.read_webdataset(spark, f"{base}/wds").count()
        assert n == n_docs, (n, n_docs)
        out["wds_read_mbps"] = round(payload / (1 << 20) / (time.monotonic() - t0), 1)

        from xarray_beam_spark.sources import warc

        wet_in = docs.select(
            F.concat(F.lit("http://p.example.com/"), F.col("doc_id").cast("string")).alias("url"),
            "text",
        )
        t0 = time.monotonic()
        warc.write_wet(wet_in, f"{base}/wet", shard_records=2048)
        out["wet_write_mbps"] = round(payload / (1 << 20) / (time.monotonic() - t0), 1)

        t0 = time.monotonic()
        n = warc.read_wet(spark, f"{base}/wet").count()
        assert n == n_docs, (n, n_docs)
        out["wet_read_mbps"] = round(payload / (1 << 20) / (time.monotonic() - t0), 1)

        resp_in = wet_in.withColumnRenamed("text", "body")
        t0 = time.monotonic()
        warc.write_warc_responses(resp_in, f"{base}/resp", shard_records=2048)
        out["warc_resp_write_mbps"] = round(
            payload / (1 << 20) / (time.monotonic() - t0), 1
        )

        t0 = time.monotonic()
        n = warc.read_warc_responses(spark, f"{base}/resp").count()
        assert n == n_docs, (n, n_docs)
        out["warc_resp_read_mbps"] = round(
            payload / (1 << 20) / (time.monotonic() - t0), 1
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
