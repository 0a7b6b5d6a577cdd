"""Similarity-search quality: approximate indexes vs the exact baseline."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from xarray_beam_spark.operators import simsearch as ss
from xarray_beam_spark.tables import load


def _recall(approx_rows, exact_rows, k=10):
    approx = {}
    exact = {}
    for r in approx_rows:
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    scores = [
        len(approx.get(q, set()) & nbrs) / len(nbrs) for q, nbrs in exact.items()
    ]
    return sum(scores) / len(scores)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    exact = ss.brute_force_topk(emb, queries, k=10).collect()
    approx = ss.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=8).collect()
    assert _recall(approx, exact) >= 0.6  # probing half the cells


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    exact = ss.brute_force_topk(emb, queries, k=10).collect()
    approx = ss.lsh_topk(emb, queries, k=10, n_planes=4, n_tables=12).collect()
    assert _recall(approx, exact) >= 0.5


def test_gemm_topk_matches_expression_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    qvecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in queries.collect()}
    expr_rows = ss.brute_force_topk(emb, queries, k=5).collect()
    gemm_rows = ss.brute_force_topk_numpy(emb, qvecs, k=5).collect()
    expr = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in expr_rows}
    gemm = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in gemm_rows}
    agree = sum(expr[key] == gemm.get(key) for key in expr) / len(expr)
    assert agree >= 0.8  # float32-GEMM vs quantized-int ties may differ slightly


def test_duplicate_clusters_components(spark):
    from xarray_beam_spark.operators.dedup import duplicate_clusters

    # chain 1-2-3-4, star 10-(11,12,13), isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
