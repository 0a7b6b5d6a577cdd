"""Bucketed / partitioned parquet sinks for co-located joins.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Spark's
answer is bucketing (hash-partition the *storage* by the join key): two
tables bucketed into the same number of buckets on the same key join with
ZERO exchange — every task reads matching buckets from both sides. This
module is the thin, opinionated wrapper the pipeline uses so fact tables
land bucketed once and every downstream join is co-located.

The reference engine (google/xarray-beam) has no relational storage story;
this is part of the long-format bridge surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) parquet
    table. Joins and aggregations keyed on ``bucket_cols`` against any
    table bucketed the same way run shuffle-free; sorting additionally
    lets sort-merge joins skip the per-task sort.

    Sizing rule for 100 TB: pick ``n_buckets`` so one bucket of the
    LARGEST co-bucketed table fits an executor's task comfortably
    (~128-512 MB compressed) — e.g. 100 TB / 256 MB ≈ 400k buckets is too
    many files, so in practice composite: partition by a coarse column
    (date) AND bucket within partitions, keeping per-partition buckets in
    the thousands."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cobucket_tables(
    spark: SparkSession,
    frames: dict[str, tuple[DataFrame, Sequence[str]]],
    n_buckets: int,
    database: str | None = None,
) -> dict[str, DataFrame]:
    """Land several frames bucketed on their respective join keys with a
    SHARED bucket count (co-bucketing requires equal counts), returning
    the re-read table handles whose scans carry bucket metadata."""
    out = {}
    for name, (df, keys) in frames.items():
        full = f"{database}.{name}" if database else name
        write_bucketed(df, full, keys, n_buckets)
        out[name] = spark.table(full)
    return out
