"""Distributed BPE trainer vs a from-scratch pure-Python reference."""

from __future__ import annotations

import re
from collections import Counter

from xarray_beam_spark.operators import bpe


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Reference Sennrich-style BPE on word frequencies (greedy left-to-
    right merge, ties lexicographic)."""
    freqs = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            freqs[w] += 1
    syms = {w: list(w) + [bpe.END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((l, r, n))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "the cat sat on the mat with the other cat",
    "low lower lowest newer newest wider widest",
    "the low cat went lower and lower still",
    "banana bandana ananas and a cabana",
]


def test_trainer_matches_reference(spark):
    got = bpe.bpe_train(_docs(spark, TEXTS), n_merges=12)
    want = _ref_bpe(TEXTS, 12)
    assert got == want


def test_trainer_deterministic_rerun(spark):
    d = _docs(spark, TEXTS)
    assert bpe.bpe_train(d, n_merges=6) == bpe.bpe_train(d, n_merges=6)


def test_distributed_trainer_matches_driver(spark, monkeypatch):
    """The small-vocabulary driver path and the distributed per-round
    argmax loop must learn the identical merge list (same pair counts,
    same tie-breaks, same early stop) — the r15 driver-path equivalence
    pin, mirroring the _cc_driver parity test."""
    d = _docs(spark, TEXTS)
    via_driver = bpe.bpe_train(d, n_merges=12)  # default: driver path
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_THRESHOLD", 0)
    via_distributed = bpe.bpe_train(d, n_merges=12)
    assert via_driver == via_distributed == _ref_bpe(TEXTS, 12)
    # boundary: a threshold EQUAL to the vocabulary size still takes the
    # driver path (limit(threshold+1) returned no extra row)
    vocab = len({w for t in TEXTS for w in re.findall(r"[a-z]+", t.lower())})
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_THRESHOLD", vocab)
    assert bpe.bpe_train(d, n_merges=12) == via_driver
    # one below: distributed
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_THRESHOLD", vocab - 1)
    assert bpe.bpe_train(d, n_merges=12) == via_driver


def test_encode_roundtrips_characters(spark):
    """Concatenated subwords (marker stripped) reproduce the original
    letter stream — merges never lose or reorder characters."""
    d = _docs(spark, TEXTS)
    merges = bpe.bpe_train(d, n_merges=8)
    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe.bpe_encode(d, merges).collect()}
    for i, t in enumerate(TEXTS):
        letters = "".join(re.findall(r"[a-z]+", t.lower()))
        joined = "".join(enc[i]).replace(bpe.END, "")
        assert joined == letters

    # encoding with MORE merges never increases token count
    merges4 = merges[:4]
    n8 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe.bpe_encode(d, merges).collect()}
    n4 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe.bpe_encode(d, merges4).collect()}
    assert all(n8[k] <= n4[k] for k in n8)


def test_overlap_merges_leftmost_first(spark):
    """[a,a,a] with merge (a,a) -> [aa,a], the reference greedy scan."""
    d = _docs(spark, ["aaa aaa aaa"])
    merges = bpe.bpe_train(d, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    enc = bpe.bpe_encode(d, merges).collect()[0]["bpe_tokens"]
    assert list(enc) == ["aa", "a", bpe.END, "aa", "a", bpe.END, "aa", "a", bpe.END]


class TestRound12Regressions:
    def test_zero_word_docs_survive_encode(self, spark):
        """NULL text / no [a-z] runs must yield []/0 — not vanish — and
        input columns must be preserved."""
        d = spark.createDataFrame(
            [(0, "low lower", "a"), (1, "12345 678", "b"), (2, None, "c")],
            "doc_id long, text string, src string",
        )
        merges = bpe.bpe_train(d, n_merges=2)
        rows = {r["doc_id"]: r for r in bpe.bpe_encode(d, merges).collect()}
        assert len(rows) == 3
        assert rows[1]["bpe_tokens"] == [] and rows[1]["n_bpe_tokens"] == 0
        assert rows[2]["bpe_tokens"] == [] and rows[2]["n_bpe_tokens"] == 0
        assert rows[0]["n_bpe_tokens"] > 0
        assert rows[0]["src"] == "a"  # other columns kept

    def test_arrow_path_matches_expression_path(self, spark):
        """The rank-loop Arrow encoder (the >128-merge path) must agree
        exactly with the chained-JVM-fold path."""
        texts = [
            "low lower lowest newer newest wide widest",
            "the cat sat on the mat with another cat",
            None,
            "banana bandana ananas",
        ]
        d = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges = bpe.bpe_train(d, n_merges=8)
        small = {
            r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
            for r in bpe.bpe_encode(d, merges).collect()
        }
        big = {
            r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
            for r in bpe._bpe_encode_arrow(
                d, merges, "text", "bpe_tokens", "doc_id"
            ).collect()
        }
        assert small == big

    @staticmethod
    def _persistent_rdd_ids(spark):
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    def test_train_storage_bounded(self, spark):
        """Each round's localCheckpoint must free the previous round's
        blocks — the trainer holds at most ~2 symbol-table copies."""
        d = _docs(spark, ["low lower lowest newer newest " * 5] * 4)
        before = self._persistent_rdd_ids(spark)
        bpe.bpe_train(d, n_merges=6)
        leaked = self._persistent_rdd_ids(spark) - before
        assert len(leaked) <= 2, f"{len(leaked)} checkpointed tables leaked"

    def test_train_cleanup_spares_foreign_persists(self, spark):
        """The per-round checkpoint release must touch ONLY the
        trainer's own tables: an RDD another job persisted in the same
        session (here: persisted mid-window by being live across the
        whole train call) must still be persisted afterwards."""
        before = self._persistent_rdd_ids(spark)
        foreign = spark.createDataFrame([(1, "x")], "id long, t string").persist()
        foreign.count()  # materialize the persist
        # only OUR persist's ids: the shared test session carries other
        # suites' caches, which their owners may unpersist concurrently
        fid = self._persistent_rdd_ids(spark) - before
        assert fid, "foreign persist did not register"
        d = _docs(spark, ["low lower lowest newer newest " * 5] * 4)
        bpe.bpe_train(d, n_merges=4)
        after = self._persistent_rdd_ids(spark)
        assert fid & after == fid, "bpe_train unpersisted a foreign RDD"
        assert foreign.count() == 1
        foreign.unpersist()
