"""Similarity-search quality: approximate indexes vs the exact baseline."""

from __future__ import annotations

import numpy as np
import pytest
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


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    exact = ss.brute_force_topk(emb, queries, k=10).collect()
    approx = ss.ivfpq_topk(
        emb, queries, k=10, n_centroids=16, n_probe=8, rerank=6
    ).collect()
    assert _recall(approx, exact) >= 0.6


def test_ivfpq_exact_rerank_sims(spark, sf_dir):
    # whatever candidates survive, the reported sim must be the EXACT
    # quantized cosine (re-rank uses raw vectors, not codes)
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ss.brute_force_topk(emb, queries, k=200).collect()
    }
    checked = 0
    for r in ss.ivfpq_topk(emb, queries, k=10, n_centroids=8, n_probe=8).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["sim"] == exact[key]
            checked += 1
    # the loop must actually compare something: an empty ivfpq result (or
    # candidates entirely outside the exact top-200) would pass vacuously
    assert checked > 0


def test_ivfpq_deterministic(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    a = sorted(map(tuple, ss.ivfpq_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, ss.ivfpq_topk(emb, queries, k=5).collect()))
    assert a == b


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


def test_duplicate_clusters_star_equals_label(spark):
    """Two-phase star CC (Kiveris et al. 2014) must agree with min-label
    propagation on random graphs."""
    import numpy as np

    from xarray_beam_spark.operators.dedup import duplicate_clusters

    rng = np.random.default_rng(11)
    n, m = 120, 150
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2)) if a != b]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    star = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(edges, algorithm="star").collect()}
    label = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(edges, algorithm="label").collect()}
    assert star == label and len(star) > 0


def test_duplicate_clusters_star_beats_diameter(spark):
    """On a 64-node path the star algorithm converges in O(log n) rounds
    while label propagation needs O(diameter) — the 100 TB property."""
    from xarray_beam_spark.operators.dedup import duplicate_clusters

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long"
    )
    star_rounds, label_rounds = [], []
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(
            edges, algorithm="star", _rounds_out=star_rounds, driver_edge_threshold=0
        ).collect()
    }
    assert got == {i: 0 for i in range(64)}
    duplicate_clusters(edges, algorithm="label", max_iters=100, _rounds_out=label_rounds).collect()
    assert star_rounds[0] <= 8 < label_rounds[0]


def test_duplicate_clusters_driver_path_parity(spark):
    """The small-graph driver union-find must label every node exactly
    like the distributed star rounds — random graphs, both paths."""
    import random

    from xarray_beam_spark.operators.dedup import duplicate_clusters

    rng = random.Random(17)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(70)})
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    fast_rounds: list = []
    fast = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(edges, _rounds_out=fast_rounds).collect()
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(edges, driver_edge_threshold=0).collect()
    }
    assert fast == dist
    assert fast_rounds == [0]  # the fast path actually engaged


def test_minhash_bucket_cap(spark, sf_dir):
    """A tiny cap must still discover high-jaccard twins (they collide in
    many bands) while bounding bucket join size."""
    from pyspark.sql import functions as F

    from xarray_beam_spark.operators.dedup import minhash_lsh_pairs
    from xarray_beam_spark.tables import load

    # deterministic slice, NOT an unordered limit(100): the union below
    # evaluates the subtree twice, and Spark does not promise the same
    # 100 rows per evaluation — diverging slices would break the
    # twin<->doc correspondence and flake the recall assertion
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 100)
    )
    words = F.split(F.col("text"), r"\s+")
    twins = docs.select(
        (F.col("doc_id") + 10**9).alias("doc_id"),
        F.concat_ws(" ", F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(1)))).alias("text"),
    )
    corpus = docs.unionAll(twins)
    pairs = minhash_lsh_pairs(corpus, min_jaccard=0.6, max_bucket_size=4).collect()
    twin_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs if r["doc_b"] - r["doc_a"] == 10**9}
    assert len(twin_pairs) >= 95  # near-full recall despite the cap


def test_minhash_hot_document_bounded_by_cap(spark):
    """Skew resilience: 300 identical copies of one document create a
    degenerate LSH bucket (quadratic pairs without mitigation). With the
    bucket cap, candidate pairs stay bounded and unrelated docs still pair."""
    from pyspark.sql import functions as F

    from xarray_beam_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base) for i in range(300)]
    rows += [(1000 + i, f"document number {i} talks about completely distinct topic "
              f"{i} with unique trailing words alpha beta gamma {i}") for i in range(20)]
    rows += [(2000 + i, f"document number {i} talks about completely distinct topic "
              f"{i} with unique trailing words alpha beta gamma {i} extra") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, min_jaccard=0.6, max_bucket_size=50)
    n = pairs.count()
    # hot-doc quadratic blowup (300*299/2 ≈ 45k pairs) is suppressed...
    assert n < 2000
    # ...but genuine near-dups across the capped corpus still surface
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    twins = sum(1 for i in range(20) if (1000 + i, 2000 + i) in found)
    assert twins >= 18


def test_neardup_blocked_matches_bruteforce_and_plan(spark, sf_dir):
    """The blocked-GEMM all-pairs scan must (a) equal the naive all-pairs
    result exactly and (b) compile WITHOUT BroadcastNestedLoopJoin or
    CartesianProduct (the r1 scale-killer)."""
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0)
    df = ss.neardup_pairs_blocked(emb, threshold=0.3, n_blocks=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {(r.vec_a, r.vec_b): r.sim for r in df.collect()}
    # naive oracle: all pairs via local numpy
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    Q = np.floor(
        np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows]) * ss.QUANT
    )
    n = np.sqrt((Q * Q).sum(axis=1))
    sims = (Q @ Q.T) / np.outer(n, n)
    want = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] >= 0.3:
                want[(ids[i], ids[j])] = sims[i, j]
    assert set(got) == set(want)
    for k_ in got:
        assert got[k_] == want[k_]  # bit-identical doubles


def test_neardup_blocked_single_block_degenerate(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 30)
    a = ss.neardup_pairs_blocked(emb, threshold=0.2, n_blocks=1).collect()
    b = ss.neardup_pairs_blocked(emb, threshold=0.2, n_blocks=7).collect()
    assert sorted((r.vec_a, r.vec_b, r.sim) for r in a) == sorted(
        (r.vec_a, r.vec_b, r.sim) for r in b
    )


def test_edit_distance_pairs_finds_mutated_twins(spark):
    """LSH-candidate + Levenshtein-verify fuzzy dedup: every lightly
    mutated twin is recovered with the exact python-Levenshtein distance;
    unrelated docs never pair."""
    import numpy as np

    from xarray_beam_spark.operators.dedup import edit_distance_pairs

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    base = [
        " ".join(rng.choice(vocab, 30).tolist()) for _ in range(40)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    # twin = drop the 2nd word (small interior edit)
    rows += [
        (1000 + i, " ".join(t.split()[:1] + t.split()[2:]))
        for i, t in enumerate(base)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = edit_distance_pairs(docs, max_dist=8).toPandas()
    twin_pairs = got[(got.doc_b - got.doc_a) == 1000]
    assert len(twin_pairs) == 40  # all twins found

    def lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[lb]

    texts = dict(rows)
    for r in twin_pairs.itertuples():
        assert r.dist == lev(texts[r.doc_a], texts[r.doc_b])


class TestSemanticDedup:
    def _emb(self, spark, vecs):
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_exact_duplicates_keep_lowest_id(self, spark):
        """Identical vectors quantize identically → centroid-sim tie →
        rank by id → only the lowest-id copy survives its cluster."""
        rng = np.random.default_rng(3)
        base = [rng.normal(size=8) for _ in range(6)]
        dup = base[4]  # ids 4, 6, 7 share one vector
        vecs = base + [dup, dup]
        emb = self._emb(spark, vecs)
        kept = ss.semantic_dedup(emb, eps=0.999, n_centroids=4)
        ids = {r["vec_id"] for r in kept.collect()}
        assert 4 in ids
        assert 6 not in ids and 7 not in ids
        # non-duplicates all survive at a near-1 threshold
        assert {0, 1, 2, 3, 5} <= ids

    def test_eps_above_one_keeps_everything(self, spark):
        rng = np.random.default_rng(5)
        emb = self._emb(spark, [rng.normal(size=8) for _ in range(10)])
        kept = ss.semantic_dedup(emb, eps=1.01, n_centroids=4)
        assert kept.count() == 10

    def test_triangular_rule_no_transitive_closure(self, spark):
        """SemDeDup drops i when ANY earlier-ranked j is ε-close, even a
        dropped j — verify against a local numpy replay."""
        rng = np.random.default_rng(11)
        vecs = [rng.normal(size=8) for _ in range(24)]
        emb = self._emb(spark, vecs)
        eps = 0.2
        got = {
            (r["vec_id"], r["cell"]) for r in ss.semantic_dedup(emb, eps=eps, n_centroids=4).collect()
        }
        qv = np.floor(np.stack([np.asarray(v, np.float32).astype(np.float64) for v in vecs]) * ss.QUANT)
        qn = np.sqrt((qv * qv).sum(axis=1))
        C = qv[:4]
        cn = qn[:4]
        csims = (qv @ C.T) / np.outer(qn, cn)
        cells = np.argmax(csims == csims.max(axis=1, keepdims=True), axis=1)
        want = set()
        for c in range(4):
            members = np.nonzero(cells == c)[0]
            cs = csims[members, c]
            order = members[np.lexsort((members, cs))]
            for pos, i in enumerate(order):
                sims = (qv[order[:pos]] @ qv[i]) / (qn[order[:pos]] * qn[i])
                if not (sims > eps).any():
                    want.add((int(i), int(c)))
        assert got == want

    def test_rerun_deterministic(self, spark):
        rng = np.random.default_rng(9)
        emb = self._emb(spark, [rng.normal(size=8) for _ in range(30)])
        a = sorted(tuple(r) for r in ss.semantic_dedup(emb, eps=0.25, n_centroids=8).collect())
        b = sorted(tuple(r) for r in ss.semantic_dedup(emb, eps=0.25, n_centroids=8).collect())
        assert a == b

    def test_tiled_triangular_matches_full_matrix(self):
        """VERDICT r7 #2: the tiled prefix scan must equal the full c x c
        matrix bit-for-bit at every block size, including blocks far
        smaller than the cell (the skewed-cell memory-cap path)."""
        rng = np.random.default_rng(17)
        Q = np.floor(rng.normal(size=(257, 16)) * ss.QUANT)  # odd size: ragged tiles
        n = np.sqrt((Q * Q).sum(axis=1))
        eps = 0.15
        full = np.tril((Q @ Q.T) / np.outer(n, n) > eps, k=-1).any(axis=1)
        for block in (1, 2, 7, 64, 256, 257, 4096):
            got = ss._triangular_drops(Q, n, eps, block=block)
            np.testing.assert_array_equal(got, full, err_msg=f"block={block}")

    def test_skewed_cell_bounded_memory(self, spark):
        """One deliberately skewed cell (every vector lands in cell 0 by
        construction: n_centroids=1) processed with a tiny tile: results
        must match the default-tile run exactly — the memory cap is pure
        mechanism, never semantics."""
        rng = np.random.default_rng(23)
        emb = self._emb(spark, [rng.normal(size=8) for _ in range(200)])
        small = sorted(
            tuple(r)
            for r in ss.semantic_dedup(emb, eps=0.2, n_centroids=1, block_rows=16).collect()
        )
        default = sorted(
            tuple(r) for r in ss.semantic_dedup(emb, eps=0.2, n_centroids=1).collect()
        )
        assert small == default and len(small) > 0
        assert {c for _, c, _ in small} == {0}  # genuinely one skewed cell


class TestPersistedIvfIndex:
    """build_ivf_index / ivf_topk_persisted: build once, query many."""

    def test_persisted_equals_fresh_and_bucketed_scan_is_shuffle_free(
        self, spark, sf_dir, tmp_path
    ):
        emb = load(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") < 8)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS annidx LOCATION '{tmp_path}'")
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ss.build_ivf_index(
                emb, "annidx.ivf", n_centroids=16, seed=7, n_buckets=4
            )
            persisted = ss.ivf_topk_persisted(
                spark, "annidx.ivf", queries, k=10, n_probe=8
            )
            fresh = ss.ivf_topk(
                emb, queries, k=10, n_centroids=16, n_probe=8, seed=7
            )
            got = sorted(map(tuple, persisted.collect()))
            want = sorted(map(tuple, fresh.collect()))
            assert got == want and len(got) > 0

            # plan: with bucketing on, the vectors-scan branch feeds the
            # join with NO Exchange; turning bucketing off inserts the
            # base-side Exchange the bucket layout exists to remove.
            import contextlib
            import io

            def _scan_branch(df):
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                tree = buf.getvalue().split("\n\n")[0]
                lines = tree.splitlines()
                join = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
                scan = next(i for i, l in enumerate(lines) if "ivf_vectors" in l)
                return "\n".join(lines[join + 1 : scan])

            # fresh DFs: an executed DF explains its AQE-finalized plan
            branch_on = _scan_branch(ss.ivf_topk_persisted(
                spark, "annidx.ivf", queries, k=10, n_probe=8
            ))
            spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
            try:
                branch_off = _scan_branch(ss.ivf_topk_persisted(
                    spark, "annidx.ivf", queries, k=10, n_probe=8
                ))
            finally:
                spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
            assert "Exchange" not in branch_on, branch_on
            assert "Exchange" in branch_off, branch_off
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
            spark.sql("DROP TABLE IF EXISTS annidx.ivf_vectors")
            spark.sql("DROP TABLE IF EXISTS annidx.ivf_centroids")
            spark.sql("DROP DATABASE IF EXISTS annidx")

    def test_persisted_index_survives_new_query_batches(self, spark, sf_dir, tmp_path):
        """Query-many: a second, different query batch against the same
        persisted index matches its own fresh computation (no state
        leaks between query batches)."""
        emb = load(spark, sf_dir, "embeddings")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS annidx2 LOCATION '{tmp_path}'")
        try:
            ss.build_ivf_index(
                emb, "annidx2.ivf", n_centroids=16, seed=7, n_buckets=4
            )
            for lo, hi in ((8, 12), (20, 24)):
                batch = emb.where(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                )
                got = sorted(map(tuple, ss.ivf_topk_persisted(
                    spark, "annidx2.ivf", batch, k=5, n_probe=8
                ).collect()))
                want = sorted(map(tuple, ss.ivf_topk(
                    emb, batch, k=5, n_centroids=16, n_probe=8, seed=7
                ).collect()))
                assert got == want and len(got) > 0
        finally:
            spark.sql("DROP TABLE IF EXISTS annidx2.ivf_vectors")
            spark.sql("DROP TABLE IF EXISTS annidx2.ivf_centroids")
            spark.sql("DROP DATABASE IF EXISTS annidx2")

    def test_persisted_data_centroids_equals_fresh(self, spark, sf_dir, tmp_path):
        """data_centroids=True (the gate mode): the persisted index's
        quantized centroids replay the exact-integer assignment, so the
        persisted answer is bit-identical to the fresh data-centroid
        ivf_topk — the property the ann_ivf_persisted_topk oracle gate
        relies on."""
        emb = load(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") < 8)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS annidx3 LOCATION '{tmp_path}'")
        try:
            ss.build_ivf_index(
                emb, "annidx3.ivf", n_centroids=32, n_buckets=4,
                data_centroids=True,
            )
            cent = spark.table("annidx3.ivf_centroids")
            assert "qcent" in cent.columns  # quantized, engine-portable
            got = sorted(map(tuple, ss.ivf_topk_persisted(
                spark, "annidx3.ivf", queries, k=10, n_probe=6
            ).collect()))
            want = sorted(map(tuple, ss.ivf_topk(
                emb, queries, k=10, n_centroids=32, n_probe=6,
                data_centroids=True,
            ).collect()))
            assert got == want and len(got) > 0
        finally:
            spark.sql("DROP TABLE IF EXISTS annidx3.ivf_vectors")
            spark.sql("DROP TABLE IF EXISTS annidx3.ivf_centroids")
            spark.sql("DROP DATABASE IF EXISTS annidx3")


def test_quantized_kmeans_trains_and_recall(spark, sf_dir):
    """The integer-exact Lloyd variant (the hash-certifiable trained
    quantizer behind ann_ivf_trained_topk) actually TRAINS — centroids
    move off their init — is rerun-deterministic, and its IVF recall
    holds up against brute force."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    Cq, Cn = ss._kmeans_quantized(emb, 32, 256, 3, "embedding", "vec_id")
    Cq2, _ = ss._kmeans_quantized(emb, 32, 256, 3, "embedding", "vec_id")
    np.testing.assert_array_equal(Cq, Cq2)  # deterministic
    init, _ = ss._collect_qcentroids(emb, 32, "embedding", "vec_id")
    assert not np.array_equal(Cq, init)  # Lloyd iterations moved them
    exact = ss.brute_force_topk(emb, queries, k=10).collect()
    approx = ss.ivf_topk(
        emb, queries, k=10, quantized_kmeans=True, n_probe=6
    ).collect()
    assert _recall(approx, exact) >= 0.5  # 6 of 32 cells probed


class TestRound12Regressions:
    def test_gemm_topk_includes_rank_k_single_partition(self, spark):
        """The self-row used to consume a partial-top-k slot, silently
        dropping the true k-th neighbor when queries ⊂ emb in one
        partition. With float-exact synthetic vectors the GEMM path must
        match a numpy oracle EXACTLY."""
        import numpy as np

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(40, 8)).astype(np.float32)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(40)],
            "vec_id long, embedding array<float>",
        ).repartition(1)
        qvecs = {i: vecs[i] for i in range(3)}
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ss.brute_force_topk_numpy(
                emb, qvecs, k=5, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        M = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for q in range(3):
            sims = M @ M[q]
            order = [
                i
                for i in sorted(range(40), key=lambda i: (-float(sims[i]), i))
                if i != q
            ]
            for rank in range(1, 6):
                assert got[(q, rank)] == order[rank - 1], (q, rank)

    def test_null_text_docs_are_not_neardup_twins(self, spark):
        from xarray_beam_spark.operators.dedup import (
            minhash_lsh_pairs,
            simhash_table,
        )

        docs = spark.createDataFrame(
            [
                (0, None),
                (1, None),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "the quick brown fox jumps over the lazy dog"),
            ],
            "doc_id long, text string",
        )
        pairs = minhash_lsh_pairs(docs, min_jaccard=0.5).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(2, 3)}
        # NULL-text docs have no shingles → no fingerprint row
        fps = {r["doc_id"] for r in simhash_table(docs).collect()}
        assert fps == {2, 3}

    def test_bad_band_config_is_loud(self, spark):
        from xarray_beam_spark.operators.dedup import minhash_lsh_pairs

        docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="must divide"):
            minhash_lsh_pairs(docs, n_hashes=64, n_bands=100)
        with pytest.raises(ValueError, match="must divide"):
            minhash_lsh_pairs(docs, n_hashes=64, n_bands=48)

    def test_nonconvergence_is_loud(self, spark):
        from xarray_beam_spark.operators.dedup import duplicate_clusters

        # a long path needs multiple label-propagation rounds
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_clusters(edges, algorithm="label", max_iters=1)

    def test_reset_unpersists_shingle_tables(self, spark):
        from xarray_beam_spark.operators import dedup

        docs = spark.createDataFrame(
            [(i, f"doc number {i} with words") for i in range(6)],
            "doc_id long, text string",
        )
        dedup.minhash_lsh_pairs(docs).count()
        assert dedup._EPHEMERAL_PERSISTS
        dedup.reset_ephemeral_caches()
        assert not dedup._EPHEMERAL_PERSISTS
