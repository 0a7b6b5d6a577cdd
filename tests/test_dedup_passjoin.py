"""PassJoin completeness: every pair within edit distance k is found —
verified against per-pair brute force, including a fixture MinHash-LSH
provably misses."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from xarray_beam_spark.operators.dedup import edit_distance_pairs, passjoin_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    return {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= k
    }


def test_passjoin_finds_pair_lsh_misses(spark):
    # single-token strings differing in one trailing char share ZERO word
    # shingles -> jaccard 0 -> the LSH candidate phase can never emit the
    # pair; PassJoin's segment pigeonhole must.
    rows = [(1, "abcdefgh"), (2, "abcdefgx"), (3, "zzzzzzzz")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        tuple(r) for r in passjoin_pairs(docs, 1).toPandas().itertuples(index=False)
    }
    assert got == {(1, 2, 1)}
    lsh = edit_distance_pairs(docs, max_dist=1)
    assert lsh.count() == 0


def test_passjoin_multi_match_window_boundaries(spark):
    # the multi-match-aware probe window clamps at position 0, at
    # __m - e.ln, and collapses to width ≤ 1 for the first segment —
    # exercise strings right at the segmentation boundary (m ≈ k+1) and
    # heavy indel drift (|Δ| = k) against brute force, k=4
    k = 4
    rng = np.random.default_rng(99)
    alpha = "ab"  # tiny alphabet maximizes accidental near-pairs
    rows = [(i, "".join(rng.choice(list(alpha), int(n)))) for i, n in
            enumerate(rng.integers(k + 1, k + 9, size=40))]
    got = {
        tuple(r)
        for r in passjoin_pairs(
            spark.createDataFrame(rows, ["doc_id", "text"]), k
        ).toPandas().itertuples(index=False)
    }
    assert got == _brute(rows, k)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_passjoin_matches_brute_force(spark, k):
    # random corpus + in-place mutations (sub/ins/del) at random offsets,
    # mixed lengths incl. strings shorter than k+1 (the short band)
    rng = np.random.default_rng(7 + k)
    alpha = "abcdef"
    rows = []
    nid = 0
    for _ in range(30):
        n = int(rng.integers(1, 20))
        s = "".join(rng.choice(list(alpha), n))
        rows.append((nid, s))
        nid += 1
        if rng.random() < 0.7:
            mut = list(s)
            for _ in range(int(rng.integers(1, k + 1))):
                op = rng.choice(["sub", "ins", "del"])
                p = int(rng.integers(0, max(len(mut), 1)))
                if op == "sub" and mut:
                    mut[p] = str(rng.choice(list(alpha)))
                elif op == "ins":
                    mut.insert(p, str(rng.choice(list(alpha))))
                elif mut:
                    del mut[p]
            if mut:
                rows.append((nid, "".join(mut)))
                nid += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        tuple(r) for r in passjoin_pairs(docs, k).toPandas().itertuples(index=False)
    }
    assert got == _brute(rows, k)


def test_passjoin_rejects_k0(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_dist"):
        passjoin_pairs(docs, 0)
