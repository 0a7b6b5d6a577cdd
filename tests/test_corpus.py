"""Corpus-cleaning funnel: stage semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from xarray_beam_spark.operators.corpus import clean_corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_clean_corpus_stages(spark):
    en = "the cat and the dog ran to the house of a friend " * 3  # ~33 tokens
    rows = [
        (1, "web", en),
        (2, "web", en),  # exact duplicate: dropped (keeps doc 1)
        (3, "web", "short text"),  # under min_tokens: dropped
        (4, "web", "zz " * 40),  # no marker words -> 'und': dropped
        (5, "books", en + "extra tail"),  # survives, distinct hash
    ]
    kept = clean_corpus(_docs(spark, rows), min_tokens=20, max_tokens=100).collect()
    got = {r["doc_id"]: (r["detected"], r["n_tokens"]) for r in kept}
    assert set(got) == {1, 5}
    assert got[1][0] == "en" and got[5][0] == "en"


def test_clean_corpus_plan_is_jvm_only(spark):
    """The funnel must fuse into scan-side JVM expressions: no Python
    eval nodes, a single source scan, shuffles only for the dedup window."""
    rows = [(i, "web", "the a of to and word %d" % i) for i in range(10)]
    kept = clean_corpus(_docs(spark, rows))
    plan = kept._sc._jvm.PythonSQLUtils.explainString(
        kept._jdf.queryExecution(), "formatted"
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert node not in plan
    assert plan.count("Exchange") <= 2  # window hash shuffle (+ AQE read)


def test_token_windows_shapes(spark):
    from xarray_beam_spark.operators.corpus import token_windows

    rows = [(1, "web", " ".join(f"w{i}" for i in range(70))),  # 70 tokens -> 3 windows
            (2, "web", "only three words")]                     # 1 window
    out = token_windows(_docs(spark, rows), window_tokens=32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    w1 = sorted(by_doc[1], key=lambda r: r["window_id"])
    assert [r["n_tokens"] for r in w1] == [32, 32, 6]
    assert [r["token_start"] for r in w1] == [1, 33, 65]
    assert w1[0]["window_text"].startswith("w0 ") and w1[2]["window_text"] == "w64 w65 w66 w67 w68 w69"
    # reassembling windows reproduces the document
    assert " ".join(r["window_text"] for r in w1) == rows[0][2]


def test_token_windows_no_shuffle_no_python(spark):
    from xarray_beam_spark.operators.corpus import token_windows

    out = token_windows(_docs(spark, [(1, "web", "a b c")]), window_tokens=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    for node in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan


def test_hash_split_deterministic_and_complete(spark):
    from xarray_beam_spark.operators.corpus import hash_split

    rows = [(i, "web", f"document number {i} body") for i in range(200)]
    d = _docs(spark, rows)
    a = {r["doc_id"]: r["split"] for r in hash_split(d, {"train": 90, "val": 5, "test": 5}).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d, {"train": 90, "val": 5, "test": 5}).collect()}
    assert a == b  # deterministic across runs
    assert set(a.values()) <= {"train", "val", "test"}
    assert sum(v == "train" for v in a.values()) > 150  # roughly 90%


def test_hash_split_salt_changes_assignment(spark):
    from xarray_beam_spark.operators.corpus import hash_split

    rows = [(i, "web", f"document number {i} body") for i in range(200)]
    d = _docs(spark, rows)
    a = {r["doc_id"]: r["split"] for r in hash_split(d, {"a": 1, "b": 1}).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d, {"a": 1, "b": 1}, salt="other").collect()}
    assert a != b


class TestPackSequences:
    def _toks(self, spark, seed=0, n=400, budget=128):
        import numpy as np

        rng = np.random.default_rng(seed)
        rows = [(int(i), int(t)) for i, t in enumerate(rng.integers(5, 90, n))]
        rows.append((10_000, budget + 50))  # oversize doc
        return spark.createDataFrame(rows, ["doc_id", "n_tokens"])

    def test_capacity_and_exactly_once(self, spark):
        from xarray_beam_spark.operators.corpus import pack_sequences

        budget = 128
        toks = self._toks(spark, budget=budget)
        got = pack_sequences(toks, budget=budget).toPandas()
        assert len(got) == got["doc_id"].nunique() == toks.count()
        fills = got.groupby("pack_id")["n_tokens"].agg(["sum", "count"])
        over = fills[fills["sum"] > budget]
        # only the oversize doc's singleton pack may exceed budget
        assert len(over) == 1 and over["count"].iloc[0] == 1

    def test_deterministic_across_partitioning(self, spark):
        from xarray_beam_spark.operators.corpus import pack_sequences

        toks = self._toks(spark, seed=3)
        a = (
            pack_sequences(toks.repartition(17), budget=128)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            pack_sequences(toks.coalesce(1), budget=128)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_packing_efficiency(self, spark):
        from xarray_beam_spark.operators.corpus import pack_sequences

        import numpy as np

        budget = 128
        toks = self._toks(spark, seed=5, n=2000)
        got = pack_sequences(toks, budget=budget, n_buckets=8).toPandas()
        total = got["n_tokens"].sum()
        n_packs = got["pack_id"].nunique()
        ideal = np.ceil(total / budget)
        # best-fit-decreasing within 8 buckets: within 15% + slack of ideal
        assert n_packs <= ideal * 1.15 + 8


class TestDecontaminate:
    def test_flags_only_overlapping_docs(self, spark):
        from xarray_beam_spark.operators.corpus import decontaminate

        bench = spark.createDataFrame(
            [(100, "The quick brown fox jumps over the lazy dog")],
            ["doc_id", "text"],
        )
        corpus = spark.createDataFrame(
            [
                # shares "quick brown fox jumps" (n=4, case/punct-folded)
                (1, "A QUICK, brown fox JUMPS today"),
                # no 4-gram overlap
                (2, "completely unrelated text about spark engines here"),
                # shares two distinct 4-grams
                (3, "the quick brown fox jumps over something"),
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r["n_hits"] for r in decontaminate(corpus, bench, n=4).collect()}
        assert got == {1: 1, 3: 3}

    def test_short_docs_never_flagged(self, spark):
        from xarray_beam_spark.operators.corpus import decontaminate

        bench = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        corpus = spark.createDataFrame([(2, "a b c")], ["doc_id", "text"])  # < n tokens
        assert decontaminate(corpus, bench, n=4).count() == 0

    def test_broadcast_join_in_plan(self, spark):
        from xarray_beam_spark.operators.corpus import decontaminate

        bench = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        corpus = spark.createDataFrame([(2, "a b c d e f")], ["doc_id", "text"])
        plan = decontaminate(corpus, bench, n=4)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestDedupAgainstReference:
    def test_removes_only_content_overlap(self, spark):
        from xarray_beam_spark.operators.dedup import dedup_against_reference

        ref = spark.createDataFrame(
            [(1, "seen before"), (2, "also seen")], ["doc_id", "text"]
        )
        docs = spark.createDataFrame(
            [
                (10, "seen before"),  # same content, different id -> dropped
                (11, "brand new"),
                (12, "also seen"),  # dropped
                (13, "SEEN BEFORE"),  # case differs -> exact dedup keeps it
            ],
            ["doc_id", "text"],
        )
        got = sorted(
            r["doc_id"] for r in dedup_against_reference(docs, ref).collect()
        )
        assert got == [11, 13]

    def test_precomputed_digest_table(self, spark):
        from pyspark.sql import functions as F

        from xarray_beam_spark.operators.dedup import dedup_against_reference

        ref = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"]).select(
            F.md5("text").alias("content_hash")
        )
        docs = spark.createDataFrame(
            [(10, "x y z"), (11, "kept")], ["doc_id", "text"]
        )
        got = dedup_against_reference(
            docs, ref, ref_hash_col="content_hash"
        ).collect()
        assert [r["doc_id"] for r in got] == [11]

    def test_null_text_is_kept(self, spark):
        from xarray_beam_spark.operators.dedup import dedup_against_reference

        ref = spark.createDataFrame(
            [(1, None)], "doc_id: long, text: string"
        )
        docs = spark.createDataFrame(
            [(10, None), (11, "a")], "doc_id: long, text: string"
        )
        got = sorted(
            r["doc_id"] for r in dedup_against_reference(docs, ref).collect()
        )
        assert got == [10, 11]  # NULL never matches, like SQL NOT EXISTS


class TestMixtureWeights:
    def test_weights_normalize_and_upweight_tail(self, spark):
        from xarray_beam_spark.operators.corpus import mixture_weights

        rows = [(i, "en" if i < 90 else "sw", "web") for i in range(100)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
        got = {r["lang"]: r for r in mixture_weights(docs).collect()}
        total = sum(r["weight"] for r in got.values())
        assert abs(total - 1.0) < 1e-12
        # alpha=0.5: the 10-doc tail gets ~sqrt(10)/ (sqrt(90)+sqrt(10))
        # ≈ 0.25 share — far above its 0.10 raw share
        assert got["sw"]["weight"] > 0.2
        assert got["en"]["n_docs"] == 90


class TestImportanceSample:
    def test_deterministic_and_monotone(self, spark):
        from pyspark.sql import functions as F

        from xarray_beam_spark.operators.corpus import importance_sample

        rows = [(i, f"doc text number {i}", (i % 40 + 1) * 100) for i in range(400)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
        prob = F.least(F.col("n_chars").cast("double") / 2000.0, F.lit(1.0))
        a = sorted(r["doc_id"] for r in importance_sample(docs, prob).collect())
        # repartitioning must not change membership (no RNG state)
        b = sorted(
            r["doc_id"]
            for r in importance_sample(docs.repartition(13), prob).collect()
        )
        assert a == b and 0 < len(a) < 400
        # keep-rate grows with probability: p=1 keeps everything, p=0 nothing
        assert importance_sample(docs, F.lit(1.0)).count() == 400
        assert importance_sample(docs, F.lit(0.0)).count() == 0
        # aggregate keep rate tracks the mean probability (hash uniformity)
        mean_p = sum(min((i % 40 + 1) * 100 / 2000.0, 1.0) for i in range(400)) / 400
        assert abs(len(a) / 400 - mean_p) < 0.08


class TestHashedQualityClassifier:
    def test_features_and_score_replay(self, spark):
        from xarray_beam_spark.operators.corpus import hashed_quality_classifier
        import hashlib

        rows = [(1, "web", "Alpha beta GAMMA!"), (2, "web", ""), (3, "web", "solo")]
        out = {
            r["doc_id"]: r
            for r in hashed_quality_classifier(_docs(spark, rows)).collect()
        }
        # doc 1: unigrams [alpha, beta, gamma] + bigrams [alpha_beta, beta_gamma]
        assert out[1]["n_features"] == 5
        assert out[2]["n_features"] == 0 and out[2]["score"] == 0 and out[2]["label"] == "drop"
        assert out[3]["n_features"] == 1  # single token -> no bigrams

        def w(tok):
            h = hashlib.md5(("xbs-qc" + tok).encode()).hexdigest()
            return int(h[24:32], 16) % 2001 - 1000

        feats = ["alpha", "beta", "gamma", "alpha_beta", "beta_gamma"]
        assert out[1]["score"] == sum(w(t) for t in feats)
        assert out[1]["label"] == ("keep" if out[1]["score"] > 0 else "drop")

    def test_plan_is_jvm_only(self, spark):
        from xarray_beam_spark.operators.corpus import hashed_quality_classifier

        rows = [(i, "web", "some text here %d" % i) for i in range(5)]
        plan = hashed_quality_classifier(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestEpochShuffle:
    def test_epochs_differ_and_reruns_agree(self, spark):
        from xarray_beam_spark.operators.corpus import epoch_shuffle

        rows = [(i, "web", f"text {i}") for i in range(200)]
        docs = _docs(spark, rows)
        e1a = sorted(map(tuple, epoch_shuffle(docs, 8, epoch=1).select("doc_id", "shard", "position").collect()))
        e1b = sorted(map(tuple, epoch_shuffle(docs, 8, epoch=1).select("doc_id", "shard", "position").collect()))
        e2 = sorted(map(tuple, epoch_shuffle(docs, 8, epoch=2).select("doc_id", "shard", "position").collect()))
        assert e1a == e1b          # rerun-stable
        assert e1a != e2           # new epoch, new permutation
        # positions within each shard are a contiguous 0..k-1 range
        from collections import defaultdict
        per = defaultdict(list)
        for _, sh, pos in e1a:
            per[sh].append(pos)
        for sh, ps in per.items():
            assert sorted(ps) == list(range(len(ps)))
        # shards roughly balanced (uniform hash): no shard empty at n=200/8
        assert len(per) == 8


def test_familiarity_score_matches_python_replay(spark):
    from xarray_beam_spark.operators.corpus import familiarity_score

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown cat naps under the warm sun",
        3: "zzqxj qjxzz xjqzz",  # gibberish: near-zero familiarity
        4: "the the the the",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    seed = docs.where(F.col("doc_id").isin(1, 2))
    got = {r["doc_id"]: r for r in familiarity_score(docs, seed).collect()}

    from collections import Counter

    def grams(t):
        t = t.lower()
        return [t[i : i + 3] for i in range(len(t) - 2)]

    counts = Counter(g for i in (1, 2) for g in grams(texts[i]))
    for i, t in texts.items():
        gs = grams(t)
        assert got[i]["n_grams"] == len(gs)
        assert got[i]["familiar_hits"] == sum(1 for g in gs if g in counts)
        assert got[i]["familiarity"] == sum(counts.get(g, 0) for g in gs) / len(gs)
    assert got[3]["familiarity"] == 0.0  # gibberish scores zero
    assert got[1]["familiarity"] > got[3]["familiarity"]


def test_familiarity_plan_broadcasts_seed(spark):
    """The seed trigram table must ride a BroadcastHashJoin (never a
    shuffled join): the corpus side is the 100 TB side."""
    from xarray_beam_spark.operators.corpus import familiarity_score

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "), F.col("id").cast("string")).alias("text"),
    )
    df = familiarity_score(docs, docs.where(F.col("doc_id") % 5 == 0))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


class TestUrlCanonicalization:
    # the canonicalization table, pinned spelling by spelling
    CASES = [
        # (raw, canonical)
        ("https://example.com/docs/1", "https://example.com/docs/1"),
        ("HTTPS://Example.COM/docs/1/", "https://example.com/docs/1"),
        ("https://www.example.com:443/docs/1", "https://example.com/docs/1"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),  # kept
        ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
        ("https://example.com/a?b=2&utm_source=x&a=1", "https://example.com/a?a=1&b=2"),
        ("https://example.com/a?utm_campaign=z", "https://example.com/a"),
        ("https://example.com/a#frag", "https://example.com/a"),
        ("https://example.com/a?x=1#frag?y=2", "https://example.com/a?x=1"),
        ("https://example.com///", "https://example.com"),
        ("https://example.com", "https://example.com"),
        # %-encoding deliberately untouched (can change the resource)
        ("https://example.com/a%2Fb", "https://example.com/a%2Fb"),
        # userinfo never changes the resource — dropped
        ("https://user:pw@example.com/a", "https://example.com/a"),
        # bracketed IPv6 literal: the :: groups are not a port
        ("https://[2001:db8::1]/p", "https://[2001:db8::1]/p"),
        ("https://[2001:db8::1]:443/p", "https://[2001:db8::1]/p"),
    ]

    def test_canonicalization_table(self, spark):
        from xarray_beam_spark.operators.corpus import canonicalize_url

        df = spark.createDataFrame(self.CASES, "raw string, want string")
        got = df.select(
            "raw", "want", canonicalize_url(F.col("raw")).alias("got")
        ).collect()
        for r in got:
            assert r["got"] == r["want"], r["raw"]

    def test_dedup_keep_first_and_host_cap(self, spark):
        from xarray_beam_spark.operators.corpus import (
            cap_per_host,
            dedup_by_canonical_url,
        )

        rows = [
            (1, "https://a.com/x"),
            (2, "HTTPS://WWW.A.COM:443/x/"),   # same page as 1
            (3, "https://a.com/x?p=1"),         # different page
            (4, "https://b.com/x"),
            (5, "https://a.com/y"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        kept = sorted(
            r["doc_id"] for r in dedup_by_canonical_url(df).collect()
        )
        assert kept == [1, 3, 4, 5]  # 2 is the later spelling of 1
        capped = sorted(
            r["doc_id"] for r in cap_per_host(df, cap=2).collect()
        )
        # host a.com has docs 1,2,3,5 -> its 2 lowest ids; b.com keeps 4
        assert capped == [1, 2, 4]

    def test_null_urls_are_kept_not_dropped(self, spark):
        from xarray_beam_spark.operators.corpus import dedup_by_canonical_url

        rows = [(1, "https://a.com/x"), (2, None), (3, None), (4, "https://a.com/x/")]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        kept = sorted(r["doc_id"] for r in dedup_by_canonical_url(df).collect())
        # NULL-url docs have nothing to dedup on: kept, never silently
        # dropped by the equi-join (code-review finding r11)
        assert kept == [1, 2, 3]

    def test_null_urls_exempt_from_host_cap(self, spark):
        from xarray_beam_spark.operators.corpus import cap_per_host

        rows = [(i, None) for i in range(1, 6)] + [
            (10, "https://a.com/x"),
            (11, "https://a.com/y"),
            (12, "https://a.com/z"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        kept = sorted(r["doc_id"] for r in cap_per_host(df, cap=2).collect())
        # hostless docs are kept (and keyed per-row, so no NULL-partition
        # skew hotspot); a.com keeps its 2 lowest ids
        assert kept == [1, 2, 3, 4, 5, 10, 11]

    def test_host_key_ipv6_and_userinfo(self, spark):
        from xarray_beam_spark.operators.corpus import canonicalize_url, url_host

        rows = [
            ("https://[2001:db8::1]:8443/p", "2001:db8::1"),
            ("https://[2001:db8::2]/p", "2001:db8::2"),
            ("https://user@example.com/p", "example.com"),
            ("https://example.com:8080/p", "example.com"),
        ]
        df = spark.createDataFrame(rows, "url string, want string")
        for r in df.select(
            "want", url_host(canonicalize_url(F.col("url"))).alias("got")
        ).collect():
            assert r["got"] == r["want"]

    def test_dedup_join_is_broadcastable_and_jvm_only(self, spark):
        from xarray_beam_spark.operators.corpus import dedup_by_canonical_url

        docs = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("https://h"),
                (F.col("id") % 20).cast("string"),
                F.lit(".com/p/"),
                (F.col("id") % 50).cast("string"),
            ).alias("url"),
        )
        plan = dedup_by_canonical_url(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


from hypothesis import given
from hypothesis import settings as hyp_settings
from hypothesis import strategies as st


class TestUrlCanonicalizationProperties:
    @hyp_settings(max_examples=8, deadline=None)
    @given(data=st.data())
    def test_canonicalization_is_idempotent(self, spark, data):
        """canonicalize(canonicalize(u)) == canonicalize(u): the
        canonical form is a fixed point, so re-running the stage (e.g.
        on an already-cleaned corpus) never changes keys."""
        from xarray_beam_spark.operators.corpus import canonicalize_url

        urls = []
        for i in range(data.draw(st.integers(1, 6), label="n")):
            scheme = data.draw(st.sampled_from(["http", "https", "HTTPS"]))
            www = data.draw(st.sampled_from(["", "www.", "WWW."]))
            user = data.draw(st.sampled_from(["", "u:p@"]))
            host = data.draw(st.sampled_from(["ex.com", "A.Ex.COM", "[2001:db8::1]"]))
            port = data.draw(st.sampled_from(["", ":80", ":443", ":8080"]))
            path = data.draw(st.sampled_from(["", "/", "/a", "/a/b//", "/a%2Fb"]))
            q = data.draw(st.sampled_from(["", "?b=2&a=1", "?utm_source=x", "?x=1&&y=2"]))
            frag = data.draw(st.sampled_from(["", "#f", "#f?x=1"]))
            urls.append((f"{scheme}://{user}{www}{host}{port}{path}{q}{frag}",))
        df = spark.createDataFrame(urls, "url string")
        rows = df.select(
            canonicalize_url(F.col("url")).alias("once"),
            canonicalize_url(canonicalize_url(F.col("url"))).alias("twice"),
        ).collect()
        for r in rows:
            assert r["once"] == r["twice"], r["once"]


def test_exact_dedup_null_text_rows_each_kept(spark):
    # NULL-text docs have unknown content: they are NOT duplicates of
    # each other, so each keeps its own row (content_hash NULL,
    # n_copies 1) instead of collapsing into one NULL group — the same
    # NULL-key policy as dedup_by_canonical_url / cap_per_host.
    from xarray_beam_spark.operators.dedup import exact_dedup

    rows = [(1, "same text"), (2, "same text"), (3, None), (4, None), (5, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["n_copies"], r["content_hash"] is None)
        for r in exact_dedup(df).collect()
    )
    assert got == [(1, 2, False), (3, 1, True), (4, 1, True), (5, 1, False)]


class TestRound12Regressions:
    def test_pack_sequences_null_tokens_is_loud(self, spark):
        from xarray_beam_spark.operators.corpus import pack_sequences

        df = spark.createDataFrame(
            [(0, 10), (1, None)], "doc_id long, n_tokens long"
        )
        with pytest.raises(Exception, match="NULL token counts"):
            pack_sequences(df, budget=100).collect()

    def test_quality_classifier_null_text_scores_zero(self, spark):
        """NULL text scores 0 (matching the oracle's COALESCE), not NULL."""
        from xarray_beam_spark.operators.corpus import hashed_quality_classifier

        df = spark.createDataFrame(
            [(0, "good words here", "s"), (1, None, "s")],
            "doc_id long, text string, source string",
        )
        rows = {r["doc_id"]: r for r in hashed_quality_classifier(df).collect()}
        assert rows[1]["score"] == 0
        assert rows[1]["label"] == "drop"


class TestE2ETrainPipeline:
    """The composed ingest->dedup->pack chain (corpus_e2e_train_pipeline
    gate) — plan-shape pins for the VERDICT r13 #5 requirement: the
    composition adds no shuffle beyond the dedup group-bys/joins, the
    pack scatter, and the pack-id join-back."""

    @staticmethod
    def _write_fixture(spark, path, n=30):
        from pyspark.sql import functions as F

        from xarray_beam_spark.sources import warc

        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{i}tok"), (F.col("id") * (i + 1)).cast("string"))
                    for i in range(12)
                ],
            ).alias("text"),
            F.lit("src").alias("source"),
        )
        words = F.split(F.col("text"), r"[ \t\n\x0B\f\r]+")
        twins = docs.select(
            (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
            F.concat_ws(
                " ", F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1)))
            ).alias("text"),
            "source",
        )
        corpus = docs.unionAll(twins)
        rows = corpus.select(
            F.concat(
                F.lit("http://src.example.com/page/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("<html><head><title>t</title></head><body><h1>"),
                F.col("source"),
                F.lit("</h1><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ).alias("body"),
            F.lit("text/html; charset=utf-8").alias("ct"),
        )
        warc.write_warc_responses(
            rows.repartition(4, "url"), path, content_type_col="ct"
        )

    def test_extraction_fuses_into_scan(self, spark, tmp_path):
        """read -> html_to_text -> token count is one stage: zero
        Exchange nodes before the dedup group-bys."""
        from pyspark.sql import functions as F

        from xarray_beam_spark.functions.text import TOKEN_SEP, html_to_text
        from xarray_beam_spark.sources import warc

        p = str(tmp_path / "warc")
        self._write_fixture(spark, p)
        ext = warc.read_warc_responses(spark, p).select(
            F.regexp_extract("url", "/page/([0-9]+)$", 1).cast("long").alias("doc_id"),
            html_to_text(F.col("body")).alias("text"),
            F.size(F.split(html_to_text(F.col("body")), TOKEN_SEP)).alias("n_tokens"),
        )
        plan = ext._jdf.queryExecution().executedPlan().toString()
        # the single Exchange is the shard-NAME list scatter (a handful
        # of rows, before the read); extraction itself adds none — the
        # regexp chain projects inside the MapInArrow stage
        assert plan.count("Exchange") == 1, plan
        assert "RoundRobinPartitioning" in plan, plan

    def test_composition_shuffle_budget_and_results(self, spark, tmp_path):
        """End to end on the fixture: every twin excised, survivors =
        originals, and the whole chain's plan stays inside the documented
        shuffle inventory (no cartesian, bounded Exchange count)."""
        from xarray_beam_spark.operators.corpus import ingest_dedup_pack

        p = str(tmp_path / "warc")
        self._write_fixture(spark, p, n=30)
        out = ingest_dedup_pack(spark, p)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # shuffle inventory (logical): minhash signature group-by,
        # band-bucket self-join, candidate-pair distinct, removed-id
        # distinct, anti-join, pack bucket scatter, pack-id join-back,
        # narrow-scan fan-out — ~8 distinct shuffles. The displayed
        # physical tree re-instantiates the shared ingest subtree on
        # every branch (AQE collapses the copies to ReusedExchange at
        # runtime), multiplying the count ~4x; the bound is a tripwire
        # against a structural regression (per-band or per-row joins
        # would add O(32+) more), not an exact inventory.
        n_exchange = plan.count("Exchange")
        assert n_exchange <= 36, f"{n_exchange} exchanges:\n{plan}"
        rows = out.collect()
        ids = sorted(r["doc_id"] for r in rows)
        assert ids == list(range(30)), ids  # all twins gone, no original lost
        assert all(r["pack_id"] is not None for r in rows)


def test_pack_sequences_carry_cols(spark):
    """carry_cols rides payload columns through the bucket scatter with
    the IDENTICAL assignment the bare call produces, and collisions with
    output columns are loud."""
    from pyspark.sql import functions as F

    from xarray_beam_spark.operators.corpus import pack_sequences

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
        F.concat(F.lit("payload"), F.col("id").cast("string")).alias("text"),
    )
    bare = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(docs, budget=10, n_buckets=4).collect()
    }
    carried = pack_sequences(docs, budget=10, n_buckets=4, carry_cols=["text"]).collect()
    assert {r["doc_id"]: r["pack_id"] for r in carried} == bare
    assert all(r["text"] == f"payload{r['doc_id']}" for r in carried)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        pack_sequences(docs, budget=10, carry_cols=["n_tokens"])
