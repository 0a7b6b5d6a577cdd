"""Similarity search over embedding columns (array<float>).

Three strategies, scale-ordered:

1. ``brute_force_topk`` — exact cosine top-k as a crossJoin + JVM
   expression dot product. O(Q·N); the baseline and the oracle surface.
2. ``brute_force_topk_numpy`` — same semantics with a vectorized Pandas
   UDF (one BLAS matmul per Arrow batch); the single-node throughput path.
3. ``lsh_topk`` — random-hyperplane LSH bucketing: candidates only from
   matching buckets, then exact re-rank. The 100 TB path: the crossJoin
   disappears, the shuffle is on band hashes.

Determinism for the oracle gate: similarities are computed on
floor-quantized integer vectors (``floor(x*1024)``), making dot products
and norms exact integer math in both Spark and DuckDB; ranking ties are
broken by neighbor id.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xarray_beam_spark.tables import load

REGISTRY: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


QUANT = 1024


def quantize(vec: Column) -> Column:
    """array<float> → array<bigint> via floor(x*QUANT) (no rounding ties)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def qcosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Quantized cosine: exact integer dot / product of precomputed norms."""
    return int_dot(a, b).cast("double") / (norm_a * norm_b)


def with_qnorm(df: DataFrame, qcol: str = "qvec") -> DataFrame:
    return df.withColumn(
        "qnorm", F.sqrt(int_dot(F.col(qcol), F.col(qcol)).cast("double"))
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (quantized cosine).

    The query side is broadcast (small by construction); ranking is a
    window over each query's candidates.
    """
    base = with_qnorm(emb.select(F.col(id_col), quantize(F.col(vec_col)).alias("qvec")))
    qs = with_qnorm(
        queries.select(F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qvec"))
    ).withColumnRenamed("qvec", "q_qvec").withColumnRenamed("qnorm", "q_qnorm")
    joined = base.crossJoin(F.broadcast(qs)).where(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        qcosine(F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm"), F.col("qnorm")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def brute_force_topk_numpy(
    emb: DataFrame,
    query_vecs: dict[int, np.ndarray],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Vectorized exact top-k: one float32 GEMM per Arrow batch, partial
    top-k per partition, final top-k by window. Single-node throughput
    path (10-100x the expression version at wide Q)."""
    spark = emb.sparkSession
    qids = sorted(query_vecs)
    Q = np.stack([np.asarray(query_vecs[q], dtype=np.float32) for q in qids])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, Qn))
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_l, Qn_l = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
            sims = Qn_l @ M.T  # (Q, batch)
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi, qid in enumerate(qids_l):
                for j in part[qi]:
                    if ids[j] != qid:
                        rows.append((qid, int(ids[j]), float(sims[qi, j])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    scored = emb.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _with_lsh_codes(
    df: DataFrame, planes: np.ndarray, vec_col: str, id_col: str, out_id: str
) -> DataFrame:
    """Add quantized vector, norm and per-table LSH codes via one GEMM per
    Arrow batch (vectorized Pandas UDF — the hot path stays BLAS)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(planes)
    n_tables = planes.shape[0]
    schema = T.StructType(
        [
            T.StructField(out_id, T.LongType()),
            T.StructField("qvec", T.ArrayType(T.LongType())),
            T.StructField("qnorm", T.DoubleType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("code", T.LongType()),
        ]
    )

    def compute(batches) -> "Iterator[pd.DataFrame]":
        P = bc.value  # (tables, planes, dim)
        weights = (1 << np.arange(P.shape[1], dtype=np.int64))
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qv = np.floor(M * QUANT).astype(np.int64)
            qn = np.sqrt((qv * qv).sum(axis=1).astype(np.float64))
            rows = {out_id: [], "qvec": [], "qnorm": [], "table": [], "code": []}
            codes = np.einsum("tpd,nd->tnp", P, M) > 0  # (tables, n, planes)
            code_vals = (codes * weights).sum(axis=2)  # (tables, n)
            for t in range(P.shape[0]):
                rows[out_id].extend(ids.tolist())
                rows["qvec"].extend(list(qv))
                rows["qnorm"].extend(qn.tolist())
                rows["table"].extend([t] * len(ids))
                rows["code"].extend(code_vals[t].tolist())
            yield pd.DataFrame(rows)

    return df.select(id_col, vec_col).mapInPandas(compute, schema)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each of ``n_tables`` hash tables assigns a vector the sign-bit code of
    ``n_planes`` fixed random hyperplanes; query candidates come only from
    buckets it shares, then exact quantized-cosine re-rank. At 100 TB this
    replaces the crossJoin with an equi-join on (table, code).
    """
    rng = np.random.default_rng(seed)
    dim = len(emb.select(vec_col).head()[0])
    planes = rng.normal(size=(n_tables, n_planes, dim))
    base = _with_lsh_codes(emb, planes, vec_col, id_col, "neighbor_id")
    qs = (
        _with_lsh_codes(queries, planes, vec_col, id_col, "query_id")
        .withColumnRenamed("qvec", "q_qvec")
        .withColumnRenamed("qnorm", "q_qnorm")
    )
    cand = (
        base.join(qs, on=["table", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            qcosine(F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm"), F.col("qnorm")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 7) -> np.ndarray:
    """Tiny seeded k-means on normalized vectors (driver-side, on a
    bounded sample — the IVF coarse quantizer's training step)."""
    rng = np.random.default_rng(seed)
    X = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-30)
    return C


def _with_ivf_cells(df: DataFrame, C: np.ndarray, vec_col: str, id_col: str, out_id: str, n_probe: int) -> DataFrame:
    """Assign each vector its ``n_probe`` nearest coarse cells (one GEMM
    per Arrow batch) + quantized vector/norm for exact re-ranking."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(C)
    schema = T.StructType(
        [
            T.StructField(out_id, T.LongType()),
            T.StructField("qvec", T.ArrayType(T.LongType())),
            T.StructField("qnorm", T.DoubleType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cl = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qv = np.floor(M * QUANT).astype(np.int64)
            qn = np.sqrt((qv * qv).sum(axis=1).astype(np.float64))
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
            sims = Mn @ Cl.T  # (n, centroids)
            p = min(n_probe, sims.shape[1])
            cells = np.argpartition(-sims, p - 1, axis=1)[:, :p]  # (n, p)
            rows = {out_id: [], "qvec": [], "qnorm": [], "cell": []}
            for j in range(p):
                rows[out_id].extend(ids.tolist())
                rows["qvec"].extend(list(qv))
                rows["qnorm"].extend(qn.tolist())
                rows["cell"].extend(cells[:, j].tolist())
            yield pd.DataFrame(rows)

    return df.select(id_col, vec_col).mapInPandas(assign, schema)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 6,
    train_limit: int = 4096,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer (the third scale
    path next to brute force and hyperplane LSH): k-means centroids are
    trained driver-side on a bounded sample, base vectors live in ONE
    cell each, queries probe their ``n_probe`` nearest cells, and the
    candidate equi-join on ``cell`` replaces the crossJoin. At 100 TB the
    base assignment is a narrow GEMM stage and the only shuffle is the
    cell join; recall is tuned by ``n_probe``/``n_centroids``.
    """
    sample = np.stack(
        [r[0] for r in emb.select(vec_col).limit(train_limit).collect()]
    ).astype(np.float64)
    C = _kmeans(sample, n_centroids, seed=seed)
    base = _with_ivf_cells(emb, C, vec_col, id_col, "neighbor_id", n_probe=1)
    qs = (
        _with_ivf_cells(queries, C, vec_col, id_col, "query_id", n_probe=n_probe)
        .withColumnRenamed("qvec", "q_qvec")
        .withColumnRenamed("qnorm", "q_qnorm")
    )
    cand = (
        base.join(qs, on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            qcosine(F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm"), F.col("qnorm")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


# ---------------------------------------------------------------------------
# gate queries
# ---------------------------------------------------------------------------

_SQL_QUANT = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))"

_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, {_SQL_QUANT} AS qv,
         sqrt(CAST(list_sum(list_transform({_SQL_QUANT}, x -> x * x)) AS DOUBLE)) AS qn
  FROM embeddings WHERE vec_id < 8
),
base AS (
  SELECT vec_id, {_SQL_QUANT} AS v,
         sqrt(CAST(list_sum(list_transform({_SQL_QUANT}, x -> x * x)) AS DOUBLE)) AS n
  FROM embeddings
),
scored AS (
  SELECT q.query_id, base.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
                       i -> q.qv[i] * base.v[i])) AS DOUBLE) / (q.qn * base.n) AS sim
  FROM q, base WHERE base.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, sim FROM ranked WHERE rank <= 10
"""


@_register("ann_brute_force_topk", _TOPK_ORACLE)
def ann_brute_force_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    return brute_force_topk(emb, queries, k=10)


_NEARDUP_ORACLE = f"""
WITH sub AS (
  SELECT vec_id, {_SQL_QUANT} AS v,
         sqrt(CAST(list_sum(list_transform({_SQL_QUANT}, x -> x * x)) AS DOUBLE)) AS n
  FROM embeddings WHERE vec_id % 10 = 0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(list_sum(list_transform(generate_series(1, len(a.v)),
                     i -> a.v[i] * b.v[i])) AS DOUBLE) / (a.n * b.n) AS sim
FROM sub a, sub b
WHERE a.vec_id < b.vec_id
  AND CAST(list_sum(list_transform(generate_series(1, len(a.v)),
                    i -> a.v[i] * b.v[i])) AS DOUBLE) / (a.n * b.n) >= 0.3
"""


@_register("embedding_neardup_pairs", _NEARDUP_ORACLE)
def embedding_neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pair scan on a 10% sample."""
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0)
    base = with_qnorm(emb.select("vec_id", quantize(F.col("embedding")).alias("qvec")))
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("qvec").alias("va"), F.col("qnorm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("qvec").alias("vb"), F.col("qnorm").alias("nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (int_dot(F.col("va"), F.col("vb")).cast("double") / (F.col("na") * F.col("nb"))).alias("sim"),
        )
        .where(F.col("sim") >= 0.3)
    )


@_register("ann_lsh_topk", None)  # approximate: candidates depend on seed
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    return lsh_topk(emb, queries, k=10)


@_register("ann_ivf_topk", None)  # approximate: recall depends on probes
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    return ivf_topk(emb, queries, k=10)
