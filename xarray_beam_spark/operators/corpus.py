"""End-to-end corpus-cleaning pipeline: the composition story.

A training-data pipeline is not one operator but a funnel — quality
filter → language filter → deduplication → corpus stats. This module
composes the engine's text and dedup primitives into that funnel as ONE
declarative DataFrame plan, so Catalyst fuses the filter stages into a
single scan pass and the only shuffles are the dedup window and the
final rollup.

Every stage is a JVM-side expression (no Python in the hot path):
- quality: token/char/stopword counts from ``functions.text``
- language: the marker-word argmax from ``functions.text``
- dedup: first-doc-per-content-hash via one window over ``md5(text)``
- rollup: map-side-combinable groupBy

At 100 TB the plan is: one scan with fused predicates → one hash
shuffle on the 128-bit content hash (near-uniform keys, no skew) → one
partial-agg rollup. Nothing is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xarray_beam_spark.functions.text import (
    detect_language,
    quality_features,
    sql_detect_language,
)
from xarray_beam_spark.tables import load

REGISTRY: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 25,
    max_tokens: int = 95,
) -> DataFrame:
    """Quality-filter, language-tag, and exact-dedup a document corpus.

    Input needs ``doc_id, source, text`` columns; output keeps one row
    per surviving document with ``detected`` (language) and ``n_tokens``
    added. Stages compose lazily — callers can keep filtering or join
    the survivors back to the full corpus.
    """
    feats = quality_features(F.col("text"))
    q = docs.select(
        "doc_id",
        "source",
        "text",
        feats["n_tokens"].alias("n_tokens"),
    ).where(F.col("n_tokens").between(min_tokens, max_tokens))
    lang = q.select(
        "*", detect_language(F.col("text")).alias("detected")
    ).where(F.col("detected") != "und")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        lang.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


_PIPELINE_ORACLE = rf"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, source, text FROM documents WHERE doc_id % 3 = 0
),
q AS (
  SELECT doc_id, source, text,
         CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
  FROM corpus
  WHERE len(regexp_split_to_array(text, '\s+')) BETWEEN 25 AND 95
),
l AS (
  SELECT *, {sql_detect_language('text')} AS detected FROM q
),
d AS (
  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM l WHERE detected <> 'und'
)
SELECT source, detected,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc
FROM d WHERE rn = 1
GROUP BY source, detected
"""


@_register("corpus_clean_pipeline", _PIPELINE_ORACLE)
def corpus_clean_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cleaning funnel over a corpus with synthesized exact
    duplicates (every third doc duplicated under a shifted id): quality
    window → language filter → exact dedup → per-(source, language)
    rollup. One scan, one hash shuffle, one partial-agg rollup."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    dups = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10**9).alias("doc_id"), "source", "text"
    )
    kept = clean_corpus(docs.unionAll(dups), min_tokens=25, max_tokens=95)
    return kept.groupBy("source", "detected").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )
