"""Training-corpus preparation pipeline, end to end.

The LLM-data shape this engine is built for: WARC response-record crawl
ingest (captured HTTP, ISO 28500 shards, one gzip member per record) →
HTML→text extraction →
URL canonicalization + keep-first URL dedup + per-host cap (RefinedWeb
stage order: the cheapest filters run before any text is read) →
PII scrub → exact-substring span removal (Lee et al. 2022) →
quality + language filter → exact dedup → near-dup clustering →
canonical doc selection → benchmark decontamination → per-source
stratified cap → context-window chunking → deterministic train/val/test
split → partitioned parquet, all as declarative Spark plans (the only
Python in the hot path is none at all — every stage is JVM expressions).

Run:  python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xarray_beam_spark.functions.text import remove_duplicate_spans, scrub_pii
from xarray_beam_spark.operators.corpus import (
    cap_per_host,
    clean_corpus,
    decontaminate,
    dedup_by_canonical_url,
    hash_split,
    stratified_cap,
    token_windows,
)
from xarray_beam_spark.operators.dedup import (
    canonical_docs,
    duplicate_clusters,
    exact_jaccard,
    minhash_lsh_pairs,
    word_shingles,
)
from xarray_beam_spark.session import get_spark
from xarray_beam_spark.tables import load


def main(sf_dir: str = "/root/testdata/sf0.001", out: str = "/tmp/corpus_out") -> None:
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    from xarray_beam_spark.shipping import ensure_shipped

    ensure_shipped(spark)

    docs = load(spark, sf_dir, "documents")
    n_raw = docs.count()

    # -2. the crawl leg: a real pipeline starts from the crawl's WARC
    # *response* records — captured HTTP messages whose body is raw
    # HTML — so round-trip the corpus through actual ISO 28500 bytes and
    # extract text with the portable regexp chain (crawl → HTML → text).
    # The WET shortcut (read_wet on pre-extracted conversion records /
    # a wet.paths manifest slice) skips straight past html_to_text.
    from xarray_beam_spark.functions.text import html_to_text
    from xarray_beam_spark.sources import warc

    warc_dir = os.path.join(out, "warc_ingest")
    # HTML-escape before wrapping: a raw '<' in document text would read
    # as a tag and html_to_text would silently swallow the span ('&'
    # first so the escapes themselves survive; the extractor decodes
    # these entities back)
    esc = F.col("text")
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.regexp_replace(esc, raw, ent)
    crawl = docs.where(F.col("text").isNotNull()).select(
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/crawl/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("<html><body><p>"), esc, F.lit("</p></body></html>")
        ).alias("body"),
    )
    warc.write_warc_responses(crawl.repartition(4, "url"), warc_dir, shard_records=256)
    ingested = warc.read_warc_responses(spark, warc_dir).where(
        (F.col("status") == 200) & F.col("content_type").startswith("text/html")
    )
    n_wet = ingested.count()
    # rejoin the extracted text to its metadata by the doc_id in the URL
    docs = (
        ingested.select(
            F.regexp_extract("url", "/crawl/([0-9]+)$", 1).cast("long").alias("doc_id"),
            html_to_text(F.col("body")).alias("text"),
        )
        .join(docs.drop("text"), on="doc_id")
    )

    # -1. URL-level dedup + per-host cap — the RefinedWeb stage order
    # puts these BEFORE any content stage (cheapest filter first: no
    # text is read to drop a re-crawled URL). The synthetic corpus has
    # no URL column, so derive a messy one (spelling varies by doc_id)
    # to show canonicalization doing real work.
    host = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.concat(F.lit("/doc/"), (F.col("doc_id") % 240).cast("string"))
    docs = docs.withColumn(
        "url",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("https://"), host, path))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("https://www."), host, path, F.lit("/")))
        .otherwise(F.concat(F.lit("HTTPS://"), F.upper(host), path, F.lit("#ref"))),
    )
    docs = dedup_by_canonical_url(docs)
    # reuse the canonical column the dedup stage materialized instead of
    # re-running the regexp chain from the raw url
    docs = cap_per_host(docs, cap=100, canonical_col="canonical_url")
    docs = docs.drop("url", "canonical_url")
    n_url_kept = docs.count()

    # 0. PII scrub — a narrow JVM regexp stage Catalyst fuses into the
    # same scan pass as the quality filter below
    docs = docs.withColumn("text", scrub_pii(F.col("text")))

    # 0b. exact-substring span removal (Lee et al. 2022 ExactSubstr
    # rewrite): excise corpus-wide duplicated 8-token spans of >= 16
    # merged tokens, keeping the first copy — run BEFORE the quality
    # filter so stats are computed on the deduplicated text
    rewritten = remove_duplicate_spans(
        docs, window=8, keep_first_occurrence=True, min_span_tokens=16
    )
    n_span_tokens = rewritten.agg(F.sum("removed_tokens")).collect()[0][0] or 0
    docs = docs.drop("text").join(
        rewritten.select("doc_id", "text"), on="doc_id"
    )

    # 1. quality + language + exact-dedup funnel (one fused scan)
    kept = clean_corpus(docs.select("doc_id", "source", "text"), min_tokens=10, max_tokens=500)
    kept = kept.select("doc_id", "source", "text").persist()
    n_clean = kept.count()

    # 2. near-dup clustering on the survivors → canonical per cluster
    pairs = minhash_lsh_pairs(kept, min_jaccard=0.8, max_bucket_size=200)
    clusters = duplicate_clusters(pairs)
    lengths = kept.select("doc_id", F.length("text").cast("long").alias("n_chars"))
    canon = canonical_docs(clusters, lengths)
    # survivors = docs not in any cluster, plus each cluster's canonical
    drop = clusters.join(
        canon.select(F.col("canonical_doc").alias("doc_id")), on="doc_id", how="left_anti"
    ).select("doc_id")
    survivors = kept.join(drop, on="doc_id", how="left_anti")
    n_canon = survivors.count()

    # 2b. benchmark decontamination: drop docs overlapping the held-out
    # eval slice (stand-in: doc_id % 23), then cap any over-represented
    # source so one domain can't dominate the mix
    bench = survivors.where(F.col("doc_id") % 23 == 0)
    pool = survivors.where(F.col("doc_id") % 23 != 0)
    contaminated = decontaminate(pool, bench, n=4).select("doc_id")
    decont = pool.join(contaminated, on="doc_id", how="left_anti")
    balanced = stratified_cap(decont, by="source", cap=1000)
    n_final = balanced.count()

    # 3. context windows + deterministic split, landed partitioned by split
    windows = token_windows(balanced, window_tokens=64)
    split = hash_split(
        windows.join(balanced.select("doc_id", "text"), on="doc_id"),
        {"train": 90, "val": 5, "test": 5},
    ).select("doc_id", "window_id", "n_tokens", "window_text", "split")
    split.write.mode("overwrite").partitionBy("split").parquet(out)

    back = spark.read.parquet(out)
    per_split = {r["split"]: r["n"] for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}

    # 4. trainer-facing export legs: the train split ships as TFRecord
    # shards of tf.train.Example (tf.data consumers) AND as a WebDataset
    # tar archive (key + .txt member per sample; dataloader streaming).
    # Both writers are zero-shuffle mapInArrow shard puts.
    from xarray_beam_spark.sources import tfrecord, webdataset

    train = back.where(F.col("split") == "train").select(
        "doc_id", "window_id", "n_tokens", "window_text"
    )
    tf_stats = tfrecord.write_tfrecords(
        train, os.path.join(out, "tfrecord"), shard_records=512
    )
    wds_stats = webdataset.write_webdataset(
        train.select(
            F.format_string("%012d-%04d", "doc_id", "window_id").alias(
                webdataset.KEY_COL
            ),
            F.col("window_text").alias("txt"),
            F.struct("doc_id", "window_id", "n_tokens").alias("meta"),
        ),
        os.path.join(out, "wds"),
        ext_map={"meta": "json"},
        shard_records=512,
    )
    n_tf_back = tfrecord.read_tfrecords(spark, os.path.join(out, "tfrecord")).count()
    assert n_tf_back == tf_stats["records"] == per_split.get("train", 0)

    print(
        f"corpus pipeline: raw={n_raw} crawl_ingested={n_wet} url_kept={n_url_kept} "
        f"span_tokens_removed={n_span_tokens} "
        f"clean={n_clean} after near-dup={n_canon} "
        f"after decontam+cap={n_final} "
        f"windows={sum(per_split.values())} splits={per_split}"
    )
    print(f"wrote partitioned parquet to {out}")
    print(
        f"exported train split: tfrecord shards={tf_stats['shards']} "
        f"records={tf_stats['records']} | wds shards={wds_stats['shards']} "
        f"samples={wds_stats['samples']}"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
