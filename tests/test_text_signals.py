"""Repetition / normalization signal edge cases (the oracle-parity suite
covers the bulk behavior; these pin the row-local corner semantics)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xarray_beam_spark.functions.text import normalize_text, repetition_signals


def _sig(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    sig = repetition_signals(F.col("text"))
    row = df.select(
        sig["dup_word_fraction"].alias("dup"),
        sig["max_2gram_fraction"].alias("big"),
    ).first()
    return row["dup"], row["big"]


def test_repetition_all_unique(spark):
    dup, big = _sig(spark, "a b c d")
    assert dup == 0.0
    assert big == 1.0 / 3.0  # every bigram occurs once


def test_repetition_fully_repeated(spark):
    dup, big = _sig(spark, "x x x x")
    assert math.isclose(dup, 0.75)
    assert big == 1.0  # "x x" is every bigram


def test_repetition_single_word(spark):
    dup, big = _sig(spark, "lonely")
    assert dup == 0.0
    assert big == 0.0  # no bigrams: guarded, not NaN


def test_repetition_mode_bigram(spark):
    # "b c" appears twice out of 5 bigrams
    dup, big = _sig(spark, "a b c b c a")
    assert math.isclose(big, 2.0 / 5.0)


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello,   WORLD!!  42 cats & 7 dogs ",)], "text string")
    got = df.select(normalize_text(F.col("text")).alias("t")).first()["t"]
    assert got == "hello world 0 cats 0 dogs"


def test_signals_are_jvm_only(spark):
    """Quality filters must stay row-local JVM expressions: no Python eval
    nodes and no shuffle anywhere in the plan."""
    df = spark.createDataFrame([("a b c",)], "text string")
    sig = repetition_signals(F.col("text"))
    out = df.select(sig["dup_word_fraction"], sig["max_2gram_fraction"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert node not in plan


class TestScrubPII:
    def test_scrub_and_counts(self, spark):
        from pyspark.sql import functions as F

        from xarray_beam_spark.functions.text import pii_counts, scrub_pii

        df = spark.createDataFrame(
            [
                (1, "mail a.smith+x@sub.example.org or b@c.io from 192.168.0.1 call 555-867-5309"),
                (2, "no pii here, just 1.2 numbers and an @ sign"),
            ],
            ["id", "t"],
        )
        out = df.select(
            "id",
            scrub_pii(F.col("t")).alias("s"),
            *[c.alias(k) for k, c in pii_counts(F.col("t")).items()],
        ).collect()
        r1 = next(r for r in out if r["id"] == 1)
        assert r1["s"] == "mail <EMAIL> or <EMAIL> from <IP> call <PHONE>"
        assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (2, 1, 1)
        r2 = next(r for r in out if r["id"] == 2)
        assert r2["s"] == "no pii here, just 1.2 numbers and an @ sign"
        assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)


class TestStratifiedCap:
    def test_exact_cap_and_determinism(self, spark):
        from xarray_beam_spark.operators.corpus import stratified_cap

        rows = [(i, f"s{i % 3}", f"doc text {i}") for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        a = stratified_cap(df, cap=5).toPandas().sort_values("doc_id").reset_index(drop=True)
        assert a.groupby("source").size().max() == 5
        # repartitioned input selects the identical rows
        b = (
            stratified_cap(df.repartition(13), cap=5)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_small_strata_untouched(self, spark):
        from xarray_beam_spark.operators.corpus import stratified_cap

        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")], ["doc_id", "source", "text"]
        )
        assert stratified_cap(df, cap=10).count() == 3


class TestSubstringDup:
    def test_hash_fn_equivalence_and_planted_dup(self, spark):
        """xxhash64 (production) and md5 (oracle-portable) must flag the
        same windows; a planted 8-token overlap across two docs is
        detected, unique text is not."""
        from xarray_beam_spark.functions.text import substring_dup_windows

        shared = "one two three four five six seven eight"
        rows = [
            (1, f"{shared} alpha beta gamma"),
            (2, f"delta {shared} epsilon"),
            (3, "nothing here repeats in any of the other documents at all"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = {
            r["doc_id"]: (r["n_windows"], r["dup_windows"])
            for r in substring_dup_windows(docs, hash_fn="xxhash64").collect()
        }
        b = {
            r["doc_id"]: (r["n_windows"], r["dup_windows"])
            for r in substring_dup_windows(docs, hash_fn="md5").collect()
        }
        assert a == b
        assert a[1][1] >= 1 and a[2][1] >= 1  # the planted span is flagged
        # unique doc: real windows, zero dups (the old self-comparing
        # tuple `a[3] == (a[3][0], 0)` never checked n_windows at all)
        assert a[3][0] > 0 and a[3][1] == 0

    def test_short_docs_have_zero_windows(self, spark):
        from xarray_beam_spark.functions.text import substring_dup_windows

        docs = spark.createDataFrame(
            [(1, "too short"), (2, "")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in substring_dup_windows(docs).collect()}
        assert got[1]["n_windows"] == 0 and got[1]["dup_frac"] == 0.0
        assert got[2]["n_windows"] == 0


class TestGopherFilter:
    def test_each_rule_fires(self, spark):
        from xarray_beam_spark.functions.text import gopher_quality_filter

        good = "the cat and the dog have fun with all of that stuff " * 5  # 60 words, stops
        rows = [
            (1, good),                                        # passes everything
            (2, "short of the and"),                          # too few words
            (3, ("x" * 30 + " ") * 60 + "the of and with"),   # mean word len too high
            (4, ("## " * 30) + good),                         # symbol ratio too high
            (5, good.replace("the", "123").replace("and", "456")
                 .replace("of", "789").replace("with", "000")
                 .replace("have", "111").replace("that", "222")),  # no stop words
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
        assert out[1]["keep"] is True
        assert out[2]["keep"] is False and out[2]["n_words"] < 50
        assert out[3]["keep"] is False and out[3]["mean_word_len"] > 10
        assert out[4]["keep"] is False and out[4]["symbol_ratio"] > 0.1
        assert out[5]["keep"] is False and out[5]["n_stop_kinds"] < 2

    def test_line_rules(self, spark):
        from xarray_beam_spark.functions.text import gopher_quality_filter

        base = "the cat and the dog have fun with all of that stuff " * 5
        bullets = "\n".join("- item %d" % i for i in range(10)) + "\n" + base
        df = spark.createDataFrame([(1, bullets)], "doc_id long, text string")
        r = gopher_quality_filter(df).collect()[0]
        assert r["bullet_frac"] > 0.9 and r["keep"] is False


class TestRemoveDuplicateSpans:
    """remove_duplicate_spans vs a pure-Python brute-force reference
    (every window enumerated, marks unioned token-by-token)."""

    @staticmethod
    def _brute_force(rows, window=8, min_count=2):
        import re
        from collections import Counter

        docs = {i: re.split(r"\s+", t) for i, t in rows}
        cnt = Counter()
        for ws in docs.values():
            for p in range(len(ws) - window + 1):
                cnt[" ".join(ws[p : p + window])] += 1
        out = {}
        for i, ws in docs.items():
            rem = [False] * len(ws)
            for p in range(len(ws) - window + 1):
                if cnt[" ".join(ws[p : p + window])] >= min_count:
                    for j in range(p, p + window):
                        rem[j] = True
            n_spans = sum(
                1 for k, r in enumerate(rem) if r and (k == 0 or not rem[k - 1])
            )
            out[i] = (
                " ".join(w for w, r in zip(ws, rem) if not r),
                len(ws),
                sum(rem),
                n_spans,
            )
        return out

    def test_vs_brute_force(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_spans

        dup = "the quick brown fox jumps over the lazy dog again today"
        rows = [
            (1, "alpha beta " + dup + " gamma delta epsilon zeta eta theta"),
            (2, "one two three " + dup + " four five six seven eight nine"),
            (3, "unique words only here nothing repeated at all in this text"),
            (4, dup),  # removed entirely -> rewritten text is empty
            (5, "short doc"),  # fewer tokens than the window: untouched
            (6, "alpha beta " + dup + " gamma delta epsilon zeta eta theta"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["text"], r["n_tokens"], r["removed_tokens"], r["n_spans"]
            )
            for r in remove_duplicate_spans(df, window=8).collect()
        }
        assert got == self._brute_force(rows, window=8)
        assert got[4][0] == "" and got[4][2] == got[4][1]  # fully excised
        assert got[5] == ("short doc", 2, 0, 0)

    def test_hash_fn_equivalence(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_spans

        dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
        df = spark.createDataFrame(
            [(1, f"a b {dup} c d"), (2, f"{dup} x y z q"), (3, "all fresh text")],
            "doc_id long, text string",
        )
        a = sorted(remove_duplicate_spans(df, hash_fn="xxhash64").collect())
        b = sorted(remove_duplicate_spans(df, hash_fn="md5").collect())
        assert a == b

    def test_disjoint_spans_counted_separately(self, spark):
        """Two duplicated regions separated by a unique gap must come out
        as two spans, with the gap tokens kept."""
        from xarray_beam_spark.functions.text import remove_duplicate_spans

        d1 = "p1 p2 p3 p4 p5 p6 p7 p8"
        d2 = "q1 q2 q3 q4 q5 q6 q7 q8"
        rows = [
            (1, f"{d1} GAPA GAPB GAPC {d2}"),
            (2, f"left {d1} mid {d2} right"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in remove_duplicate_spans(df, window=8).collect()}
        assert got[1]["n_spans"] == 2
        assert got[1]["text"] == "GAPA GAPB GAPC"
        assert got[1]["removed_tokens"] == 16
        assert got[2]["n_spans"] == 2
        assert got[2]["text"] == "left mid right"

    @staticmethod
    def _brute_force_policy(rows, window=8, min_count=2,
                            min_span_tokens=0, keep_first=False):
        """Brute-force reference for the paper-policy knobs: global first
        occurrence of each dup window unmarked, merged spans shorter than
        min_span_tokens kept."""
        import re
        from collections import defaultdict

        docs = {i: re.split(r"\s+", t) for i, t in rows}
        occ = defaultdict(list)  # window text -> [(doc_id, pos)]
        for i in sorted(docs):
            ws = docs[i]
            for p in range(len(ws) - window + 1):
                occ[" ".join(ws[p : p + window])].append((i, p))
        out = {}
        for i, ws in docs.items():
            marked = [False] * len(ws)
            for key, places in occ.items():
                if len(places) < min_count:
                    continue
                skip = min(places) if keep_first else None
                for d, p in places:
                    if d != i or (keep_first and (d, p) == skip):
                        continue
                    for j in range(p, p + window):
                        marked[j] = True
            # merged intervals, then the length floor
            spans, s = [], None
            for k, r in enumerate(marked + [False]):
                if r and s is None:
                    s = k
                elif not r and s is not None:
                    spans.append((s, k - 1))
                    s = None
            spans = [sp for sp in spans if sp[1] - sp[0] + 1 >= min_span_tokens]
            rem = [False] * len(ws)
            for s0, e0 in spans:
                for j in range(s0, e0 + 1):
                    rem[j] = True
            out[i] = (
                " ".join(w for w, r in zip(ws, rem) if not r),
                len(ws),
                sum(rem),
                len(spans),
            )
        return out

    def test_keep_first_occurrence_vs_brute_force(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_spans

        dup = "the quick brown fox jumps over the lazy dog again today"
        rows = [
            (1, "alpha beta " + dup + " gamma delta epsilon zeta eta theta"),
            (2, "one two three " + dup + " four five six seven eight nine"),
            (3, "unique words only here nothing repeated at all in this text"),
            (4, dup),
            (6, "alpha beta " + dup + " gamma delta epsilon zeta eta theta"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["removed_tokens"], r["n_spans"])
            for r in remove_duplicate_spans(
                df, window=8, keep_first_occurrence=True
            ).collect()
        }
        want = self._brute_force_policy(rows, window=8, keep_first=True)
        assert got == want
        # doc 1 is the lowest (doc_id, pos) copy of every window it
        # shares: nothing excised there, while doc 6 (identical text)
        # loses the duplicated region.
        assert got[1][2] == 0
        assert got[6][2] > 0

    def test_min_span_tokens_floor(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_spans

        short = "s1 s2 s3 s4 s5 s6 s7 s8"                      # 8-token span
        long = " ".join(f"L{i}" for i in range(20))             # 20-token span
        rows = [
            (1, f"{short} gapa gapb gapc {long}"),
            (2, f"x {short} y {long} z"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_spans(
                df, window=8, min_span_tokens=12
            ).collect()
        }
        want = self._brute_force_policy(rows, window=8, min_span_tokens=12)
        for i, r in got.items():
            assert (r["text"], r["n_tokens"], r["removed_tokens"], r["n_spans"]) == want[i]
        # the 8-token span is below the floor -> kept; the 20-token one goes
        assert got[1]["n_spans"] == 1
        assert got[1]["text"].startswith("s1 s2")
        assert "L0" not in got[1]["text"]

    def test_policy_knobs_compose(self, spark):
        """keep_first + min_span together: surviving marks from the
        keep-first pass still obey the merged-span length floor."""
        from xarray_beam_spark.functions.text import remove_duplicate_spans

        long = " ".join(f"c{i}" for i in range(24))
        rows = [
            (1, f"head {long} tail"),
            (2, f"pre {long} post"),
            (3, f"{long}"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["removed_tokens"], r["n_spans"])
            for r in remove_duplicate_spans(
                df, window=8, min_span_tokens=16, keep_first_occurrence=True
            ).collect()
        }
        want = self._brute_force_policy(
            rows, window=8, min_span_tokens=16, keep_first=True
        )
        assert got == want
        assert got[1][2] == 0  # first copy untouched
        assert got[2][2] >= 16 and got[3][2] >= 16


class TestTfidfTopTerms:
    def test_vs_brute_force(self, spark):
        from collections import Counter

        from xarray_beam_spark.functions.text import tfidf_top_terms

        rows = [
            (1, "apple banana apple cherry"),
            (2, "banana banana durian"),
            (3, "apple elderberry elderberry elderberry"),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = [
            (r["doc_id"], r["rank"], r["term"], r["tf"], r["score"])
            for r in tfidf_top_terms(df, k=2).orderBy("doc_id", "rank").collect()
        ]

        tfs = {i: Counter(t.split()) for i, t in rows if t}
        dfs = Counter(term for c in tfs.values() for term in c)
        n = len(rows)
        want = []
        for i in sorted(tfs):
            scored = sorted(
                (
                    (term, tf, tf * ((1_000_000 * n) // dfs[term]))
                    for term, tf in tfs[i].items()
                ),
                key=lambda x: (-x[2], x[0]),
            )[:2]
            want += [
                (i, r + 1, term, tf, s) for r, (term, tf, s) in enumerate(scored)
            ]
        assert got == want
        assert not any(d == 4 for d, *_ in got)  # empty doc: no terms

    def test_rare_term_beats_common(self, spark):
        from xarray_beam_spark.functions.text import tfidf_top_terms

        rows = [(i, "the " + ("zebra" if i == 0 else "yak")) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        top1 = {
            r["doc_id"]: r["term"]
            for r in tfidf_top_terms(df, k=1).collect()
        }
        assert top1[0] == "zebra"  # df=1 beats same-tf 'the' (df=10)
        # yak: df=9 -> idf 1e7//9 = 1_111_111 > 'the' (1e7//10) at equal tf
        assert all(v == "yak" for k, v in top1.items() if k)


class TestRemoveDuplicateSpansProperty:
    """Hypothesis: engine == brute force for random corpora across the
    policy-knob grid (small alphabet forces window collisions; catches
    interval-merge and keep-first tie edge cases fixed cases miss)."""

    @settings(max_examples=10, deadline=None)
    @given(data=st.data())
    def test_random_corpora_match_brute_force(self, spark, data):
        alphabet = ["aa", "bb", "cc"]
        n_docs = data.draw(st.integers(2, 5))
        rows = []
        for i in range(n_docs):
            n_tok = data.draw(st.integers(0, 14), label=f"len_{i}")
            toks = [
                alphabet[data.draw(st.integers(0, 2), label=f"t_{i}_{j}")]
                for j in range(n_tok)
            ]
            rows.append((i, " ".join(toks)))
        window = data.draw(st.integers(2, 4), label="window")
        keep_first = data.draw(st.booleans(), label="keep_first")
        min_span = data.draw(st.sampled_from([0, window, window + 2]), label="min_span")

        from xarray_beam_spark.functions.text import remove_duplicate_spans

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["removed_tokens"], r["n_spans"])
            for r in remove_duplicate_spans(
                df,
                window=window,
                min_span_tokens=min_span,
                keep_first_occurrence=keep_first,
            ).collect()
        }
        want = TestRemoveDuplicateSpans._brute_force_policy(
            rows, window=window, min_span_tokens=min_span, keep_first=keep_first
        )
        assert got == want


class TestC4SentenceDedup:
    def test_sentence_split_reconstructs_exactly(self, spark):
        """The segmentation's defining property: concatenating the
        sentence array reproduces the input byte for byte, including
        weird whitespace, bare punctuation runs, and missing terminal
        punctuation."""
        from xarray_beam_spark.functions.text import split_sentences

        cases = [
            "One. Two!  Three?\n\nFour without end",
            "no punctuation at all",
            "!! leading punct. then text",
            "trailing spaces.   ",
            "a.b.c",
            "",
            "Multi...   ellipsis?! mixed.",
        ]
        df = spark.createDataFrame([(c,) for c in cases], "text string")
        rows = df.select(
            "text",
            F.array_join(split_sentences(F.col("text")), "").alias("re"),
        ).collect()
        for r in rows:
            assert r["re"] == r["text"], repr(r["text"])

    def test_c4_policy_keep_first_and_formatting(self, spark):
        from xarray_beam_spark.functions.text import (
            remove_duplicate_sentence_spans,
        )

        span = "Alpha one. Beta two!  Gamma three? "
        rows = [
            (1, f"Intro A. {span}Outro A."),
            (2, f"Intro B.\n{span}Outro B."),
            (3, "Only unique sentences here. Nothing shared at all."),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_sentence_spans(df, window=3).collect()
        }
        # doc 1 holds the first copy: untouched, formatting intact
        assert got[1]["text"] == rows[0][1]
        assert got[1]["removed_sentences"] == 0
        # doc 2 loses exactly the 3-sentence span, survivors verbatim
        assert got[2]["text"] == "Intro B.\nOutro B."
        assert got[2]["removed_sentences"] == 3 and got[2]["n_spans"] == 1
        assert got[3]["removed_sentences"] == 0

    def test_excise_every_copy_mode(self, spark):
        from xarray_beam_spark.functions.text import (
            remove_duplicate_sentence_spans,
        )

        span = "Dup one. Dup two. Dup three. "
        df = spark.createDataFrame(
            [(1, f"{span}tail one."), (2, f"{span}tail two.")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_sentence_spans(
                df, window=3, keep_first_occurrence=False
            ).collect()
        }
        assert got[1]["text"] == "tail one." and got[2]["text"] == "tail two."

    def test_overlapping_windows_merge(self, spark):
        """A 4-sentence shared run yields two overlapping 3-windows that
        must merge into ONE removed span of 4 sentences."""
        from xarray_beam_spark.functions.text import (
            remove_duplicate_sentence_spans,
        )

        run = "S1 a. S2 b. S3 c. S4 d. "
        df = spark.createDataFrame(
            [(1, f"{run}u1."), (2, f"{run}u2.")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_sentence_spans(df, window=3).collect()
        }
        assert got[1]["removed_sentences"] == 0  # first copy kept
        assert got[2]["n_spans"] == 1 and got[2]["removed_sentences"] == 4
        assert got[2]["text"] == "u2."


class TestLineDedup:
    def test_keep_first_and_exemptions(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_lines

        boiler = "subscribe to our newsletter today"
        rows = [
            (1, f"unique alpha content\n{boiler}\nok\nmore alpha text"),
            (2, f"{boiler}\nunique beta content\nok"),
            (3, f"gamma only here\n{boiler}"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_lines(df, min_line_chars=5).collect()
        }
        # doc 1 holds the first copy of the boilerplate: untouched
        assert got[1]["text"] == rows[0][1]
        assert got[1]["removed_lines"] == 0
        # docs 2 and 3 lose it; 'ok' (< 5 chars) is exempt despite dup
        assert got[2]["text"] == "unique beta content\nok"
        assert got[2]["removed_lines"] == 1
        assert got[3]["text"] == "gamma only here"
        # byte-exact survivors (newlines intact)
        assert "\n" in got[2]["text"]

    def test_adjacent_removed_lines_merge_into_one_span(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_lines

        block = "boiler line one\nboiler line two"
        df = spark.createDataFrame(
            [(1, f"{block}\nkeep a"), (2, f"{block}\nkeep b")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r for r in remove_duplicate_lines(df).collect()
        }
        assert got[1]["removed_lines"] == 0
        assert got[2]["removed_lines"] == 2 and got[2]["n_spans"] == 1
        assert got[2]["text"] == "keep b"

    def test_excise_all_copies_mode(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_lines

        df = spark.createDataFrame(
            [(1, "shared boilerplate line\nkeep one"),
             (2, "shared boilerplate line\nkeep two")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["text"]
            for r in remove_duplicate_lines(
                df, keep_first_occurrence=False
            ).collect()
        }
        assert got == {1: "keep one", 2: "keep two"}

    def test_blank_lines_never_removed(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_lines

        df = spark.createDataFrame(
            [(1, "paragraph one here\n\nparagraph two here"),
             (2, "different text\n\nother different text")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r for r in remove_duplicate_lines(df).collect()
        }
        # the duplicated blank line is exempt structure in both docs
        assert got[1]["removed_lines"] == 0 and got[2]["removed_lines"] == 0
        assert got[1]["text"] == "paragraph one here\n\nparagraph two here"


class TestSentenceSplitProperty:
    @settings(max_examples=10, deadline=None)
    @given(data=st.data())
    def test_random_text_reconstructs_exactly(self, spark, data):
        """Segmentation totality: for ANY text built from word chars,
        punctuation runs, and whitespace (incl. leading punctuation and
        no terminal punctuation), concatenating the sentence array must
        reproduce the input byte for byte."""
        from xarray_beam_spark.functions.text import split_sentences

        pieces = []
        for _ in range(data.draw(st.integers(0, 12), label="n_pieces")):
            kind = data.draw(st.sampled_from(["word", "punct", "space"]))
            if kind == "word":
                pieces.append(data.draw(st.text("abcXYZ09,;-", min_size=1, max_size=6)))
            elif kind == "punct":
                pieces.append(data.draw(st.text(".!?", min_size=1, max_size=3)))
            else:
                pieces.append(data.draw(st.text(" \t\n", min_size=1, max_size=3)))
        text = "".join(pieces)
        df = spark.createDataFrame([(text,)], "text string")
        got = df.select(
            F.array_join(split_sentences(F.col("text")), "").alias("re")
        ).first()["re"]
        assert got == text, repr(text)


class TestRemoveDuplicateCharSpans:
    """Char-granularity ExactSubstr (Lee et al. 2022 index bytes, not
    tokens): brute-force parity, boundary-straddling duplicates the
    token mode cannot see, and byte-exact reconstruction."""

    @staticmethod
    def _brute_force_chars(rows, window, min_count=2, min_span=0, keep_first=True):
        from collections import defaultdict

        # mirror split(text, '') in both engines: '' -> ['']
        docs = {i: (list(t) if t else [""]) for i, t in rows}
        occ = defaultdict(list)
        for i in sorted(docs):
            cs = docs[i]
            for p in range(len(cs) - window + 1):
                occ["".join(cs[p : p + window])].append((i, p))
        out = {}
        for i, cs in docs.items():
            marked = [False] * len(cs)
            for key, places in occ.items():
                if len(places) < min_count:
                    continue
                skip = min(places) if keep_first else None
                for d, p in places:
                    if d != i or (keep_first and (d, p) == skip):
                        continue
                    for j in range(p, p + window):
                        marked[j] = True
            spans, s = [], None
            for k, r in enumerate(marked + [False]):
                if r and s is None:
                    s = k
                elif not r and s is not None:
                    spans.append((s, k - 1))
                    s = None
            spans = [sp for sp in spans if sp[1] - sp[0] + 1 >= min_span]
            rem = [False] * len(cs)
            for s0, e0 in spans:
                for j in range(s0, e0 + 1):
                    rem[j] = True
            out[i] = (
                "".join(c for c, r in zip(cs, rem) if not r),
                len(cs),
                sum(rem),
                len(spans),
            )
        return out

    @staticmethod
    def _run(spark, rows, **kw):
        from xarray_beam_spark.functions.text import remove_duplicate_char_spans

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: (r["text"], r["n_chars"], r["removed_chars"], r["n_spans"])
            for r in remove_duplicate_char_spans(df, **kw).collect()
        }

    def test_catches_boundary_straddling_duplicate(self, spark):
        from xarray_beam_spark.functions.text import remove_duplicate_spans

        # the duplicate lives INSIDE single whitespace tokens (no-space
        # script / URL-ish): invisible to any token window >= 2
        dup = "quick.brown,fox;jumps!over"
        rows = [
            (1, "aaa bbb x" + dup + "y ccc ddd"),
            (2, "eee z" + dup + "w fff ggg hhh"),
        ]
        got = self._run(spark, rows, window=len(dup), keep_first_occurrence=True)
        assert got == self._brute_force_chars(rows, window=len(dup))
        assert got[1][2] == 0  # first copy kept
        assert got[2][2] == len(dup)
        assert dup not in got[2][0]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        token_mode = {
            r["doc_id"]: r["removed_tokens"]
            for r in remove_duplicate_spans(df, window=2).collect()
        }
        assert token_mode == {1: 0, 2: 0}  # token windows never collide

    def test_reconstruction_byte_exact_when_nothing_removed(self, spark):
        rows = [(1, "entirely unique text one"), (2, "and another different doc")]
        got = self._run(spark, rows, window=10)
        for i, text in rows:
            assert got[i][0] == text

    @settings(max_examples=10, deadline=None)
    @given(data=st.data())
    def test_random_corpora_match_brute_force(self, spark, data):
        n_docs = data.draw(st.integers(2, 4))
        rows = []
        for i in range(n_docs):
            rows.append(
                (i, data.draw(st.text("ab .", max_size=14), label=f"text_{i}"))
            )
        window = data.draw(st.integers(2, 4), label="window")
        keep_first = data.draw(st.booleans(), label="keep_first")
        min_span = data.draw(st.sampled_from([0, window + 1]), label="min_span")
        got = self._run(
            spark,
            rows,
            window=window,
            keep_first_occurrence=keep_first,
            min_span_chars=min_span,
        )
        want = self._brute_force_chars(
            rows, window=window, keep_first=keep_first, min_span=min_span
        )
        assert got == want


class TestHtmlToText:
    """html_to_text: semantics + Java/RE2 dialect parity on hostile input."""

    def _extract(self, spark, s):
        from pyspark.sql import functions as F

        from xarray_beam_spark.functions.text import html_to_text

        df = spark.createDataFrame([(s,)], "html string")
        return df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]

    def test_basic_structure(self, spark):
        got = self._extract(
            spark,
            "<html><head><title>x</title><script>var a=1;</script></head>"
            "<body><h1>Title</h1><p>one</p><p>two</p></body></html>",
        )
        assert got == "Title\none\ntwo"

    def test_script_style_contents_dropped(self, spark):
        got = self._extract(
            spark,
            "<p>keep</p><style>p { display: none }</style>"
            "<SCRIPT type='x'>if (1 < 2) { alert('<p>no</p>') }</SCRIPT><p>end</p>",
        )
        assert got == "keep\nend"

    def test_comments_and_doctype_dropped(self, spark):
        got = self._extract(
            spark, "<!DOCTYPE html><!-- secret --><p>visible</p><!-- a > b -->"
        )
        assert got == "visible"

    def test_entities(self, spark):
        got = self._extract(spark, "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp;</p>")
        assert got == "a <b> \"c\" 'd' e f &"

    def test_double_escaped_entity_stays_text(self, spark):
        # "&amp;lt;" is the TEXT "&lt;" — decoding &amp; last keeps it so
        assert self._extract(spark, "<p>&amp;lt;script&amp;gt;</p>") == "&lt;script&gt;"

    def test_inline_tags_become_spaces(self, spark):
        assert self._extract(spark, "a<b>bold</b>c <em>d</em>") == "a bold c d"

    def test_null_propagates(self, spark):
        from pyspark.sql import functions as F

        from xarray_beam_spark.functions.text import html_to_text

        df = spark.createDataFrame([(None,)], "html string")
        assert df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"] is None

    def test_dialect_parity_on_hostile_strings(self, spark):
        """The Spark chain and the DuckDB oracle chain must agree byte-
        for-byte — including on \\x0B (vertical tab), where Java's \\s
        and RE2's \\s famously differ (we use explicit classes)."""
        import duckdb
        from pyspark.sql import functions as F

        from xarray_beam_spark.functions.text import html_to_text, sql_html_to_text

        hostiles = [
            "a\x0bb<p>c</p>",                       # vertical tab
            "<p>x\r\ny</p>\t z",                    # CRLF + tabs
            "< notatag <p>ok</p>",                  # stray '<'
            "<p attr='<'>tricky</p>",               # '<' inside attribute
            "<script>unclosed",                     # unterminated script
            "text only, no markup",
            "<P>UPPER</P><BR>case",
            "&amp;&amp;lt;&nbsp;&nbsp;",
            "<div><ul><li>a</li><li>b</li></ul></div>",
            "",
            # U+212A KELVIN SIGN case-folds to 'k' under RE2's (?i) but
            # not Java's — the chain must use explicit [kK] classes so
            # a fake '<blocKquote>' tag reads identically (as an
            # unknown tag → space) in both engines
            "a<BLOCKQUOTE>b",
            "x<SCRIPTK>y</SCRIPTK>z",
        ]
        df = spark.createDataFrame([(h,) for h in hostiles], "html string")
        got = (
            df.select(html_to_text(F.col("html")).alias("t"))
            .toPandas()["t"]
            .tolist()
        )
        con = duckdb.connect()
        want = [
            con.execute(f"SELECT {sql_html_to_text('?::VARCHAR')}", [h]).fetchone()[0]
            for h in hostiles
        ]
        assert got == want


class TestRound12Regressions:
    def test_pii_boundary_matches_re2_on_non_ascii(self, spark):
        """Java's Unicode \\b saw no boundary in 'café192.168.0.1' while
        RE2's ASCII \\b did — Spark under-redacted relative to every
        oracle. The Spark side now spells the boundary as ASCII
        lookarounds; both engines must agree."""
        import duckdb

        from xarray_beam_spark.functions.text import scrub_pii, sql_scrub_pii

        cases = [
            "café192.168.0.1 and café555-123-4567",
            "plain 10.0.0.1 text",
            "word192.168.0.1 stays",  # ASCII word char: no boundary, keep
            "x_555-123-4567 stays",   # underscore is a word char in both
        ]
        df = spark.createDataFrame([(c,) for c in cases], "t string")
        got = [r["s"] for r in df.select(scrub_pii(F.col("t")).alias("s")).collect()]
        con = duckdb.connect()
        for case, spark_out in zip(cases, got):
            want = con.execute(
                f"SELECT {sql_scrub_pii('t')} FROM (SELECT ? AS t)", [case]
            ).fetchone()[0]
            assert spark_out == want, (case, spark_out, want)
        assert "<IP>" in got[0] and "<PHONE>" in got[0]
        assert got[2] == cases[2] and got[3] == cases[3]

    def test_token_sep_matches_re2_on_vertical_tab(self, spark):
        """\\x0B: inside Java's \\s, outside RE2's — the spelled-out class
        keeps both engines splitting identically."""
        import duckdb

        from xarray_beam_spark.functions.text import token_count

        df = spark.createDataFrame([("a\x0bb c",)], "t string")
        n_spark = df.select(token_count(F.col("t")).alias("n")).collect()[0]["n"]
        n_duck = duckdb.connect().execute(
            r"SELECT len(regexp_split_to_array(?, '[ \t\n\x0B\f\r]+'))",
            ["a\x0bb c"],
        ).fetchone()[0]
        assert n_spark == n_duck == 3

    def test_rewrite_gates_coalesce_null_text_fp(self, spark):
        """The span-dedup gates' rewritten_fp must md5 a COALESCEd text
        (the oracles all spell md5(COALESCE(text,''))) — a plain
        F.md5('text') would return NULL for NULL-text docs and break
        hash parity the first time a corpus carries one. Also pin the
        operator itself: NULL text survives as a row (never dropped)."""
        import hashlib

        from xarray_beam_spark.functions.text import remove_duplicate_spans
        from xarray_beam_spark.registry import queries

        # behavioral pin, not a source grep (a grep only catches one
        # exact spelling of the regression): run the actual gate over a
        # store whose documents include a NULL text and assert the
        # NULL-text row fingerprints as md5('') like the oracle's
        # COALESCE does
        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta " * 4), (1, None)],
            "doc_id long, text string",
        )
        import tempfile

        sfdir = tempfile.mkdtemp(prefix="xbs_nulltext_")
        docs.selectExpr(
            "doc_id", "text", "'en' AS lang", "'t' AS source",
            "CAST(length(text) AS LONG) AS n_chars",
        ).write.mode("overwrite").parquet(f"{sfdir}/documents.parquet")
        fp_rows = {
            r["doc_id"]: r["rewritten_fp"]
            for r in queries()["text_remove_dup_spans"](spark, sfdir).collect()
        }
        assert fp_rows[1] == hashlib.md5(b"").hexdigest()
        out = remove_duplicate_spans(docs, window=4)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert len(rows) == 2 and rows[1]["text"] is None


class TestSpanEngineDifferential:
    """Randomized differential test of the shared span engine against a
    brute-force Python model — guards the r14 structural rewrites
    (column binding, xxhash64 keys, splice-leg reuse) across every unit
    granularity and policy knob on corpora the planted fixtures don't
    cover: tiny alphabets force heavy window collisions, empty docs,
    docs shorter than the window, cross-doc and within-doc duplicates."""

    @staticmethod
    def _model(units_per_doc, window, min_count, keep_first, min_span, sep,
               exempt=None):
        # windows by exact string value (hash-free: the engine's hash is
        # an implementation detail; equality is the semantics); windows
        # containing any EXEMPT unit never participate
        occ = {}
        for did in sorted(units_per_doc):
            us = units_per_doc[did]
            for p in range(1, len(us) - window + 2):
                win = us[p - 1 : p - 1 + window]
                if exempt is not None and any(exempt(u) for u in win):
                    continue
                key = sep.join(win)
                occ.setdefault(key, []).append((did, p))
        marked = {did: set() for did in units_per_doc}
        for key, locs in occ.items():
            if len(locs) < min_count:
                continue
            skip = min(locs) if keep_first else None
            for loc in locs:
                if loc == skip:
                    continue
                marked[loc[0]].add(loc[1])
        out = {}
        for did, us in units_per_doc.items():
            ivs = []
            for p in sorted(marked[did]):
                s, e = p, p + window - 1
                if ivs and s <= ivs[-1][1] + 1:
                    ivs[-1] = (ivs[-1][0], max(ivs[-1][1], e))
                else:
                    ivs.append((s, e))
            if min_span > 1:
                ivs = [(s, e) for s, e in ivs if e - s + 1 >= min_span]
            dead = {i for s, e in ivs for i in range(s, e + 1)}
            kept = [u for i, u in enumerate(us, start=1) if i not in dead]
            out[did] = (
                sep.join(kept),
                len(us),
                sum(e - s + 1 for s, e in ivs),
                len(ivs),
            )
        return out

    def _run_case(self, spark, texts, mode, window, min_count, keep_first, min_span):
        import re

        from xarray_beam_spark.functions import text as T

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        if mode == "token":
            got = T.remove_duplicate_spans(
                docs, window=window, min_count=min_count,
                keep_first_occurrence=keep_first, min_span_tokens=min_span,
            )
            units = {i: re.split(r"[ \t\n\x0B\f\r]+", t) for i, t in enumerate(texts)}
            sep = " "
            cols = ("n_tokens", "removed_tokens")
        elif mode == "char":
            got = T.remove_duplicate_char_spans(
                docs, window=window, min_count=min_count,
                keep_first_occurrence=keep_first, min_span_chars=min_span,
            )
            units = {i: (list(t) if t else [""]) for i, t in enumerate(texts)}
            sep = ""
            cols = ("n_chars", "removed_chars")
        elif mode == "line":
            got = T.remove_duplicate_lines(
                docs, min_count=min_count, min_line_chars=4,
                keep_first_occurrence=keep_first,
            )
            units = {i: t.split("\n") for i, t in enumerate(texts)}
            sep = "\n"
            cols = ("n_lines", "removed_lines")
            want = self._model(
                units, 1, min_count, keep_first, 0, sep,
                exempt=lambda u: len(u.strip()) < 4,
            )
            rows = {r["doc_id"]: r for r in got.collect()}
            assert set(rows) == set(want)
            for did, (w_text, w_n, w_rm, w_sp) in want.items():
                r = rows[did]
                assert r["text"] == w_text, ("line", did, r["text"], w_text)
                assert r[cols[0]] == w_n and r[cols[1]] == w_rm
                assert r["n_spans"] == w_sp
            return
        else:  # sentence
            got = T.remove_duplicate_sentence_spans(
                docs, window=window, min_count=min_count,
                keep_first_occurrence=keep_first,
            )
            units = {
                i: re.findall(T.SENTENCE_PATTERN, t) for i, t in enumerate(texts)
            }
            sep = ""
            cols = ("n_sentences", "removed_sentences")
        want = self._model(units, window, min_count, keep_first, min_span, sep)
        rows = {r["doc_id"]: r for r in got.collect()}
        assert set(rows) == set(want)
        for did, (w_text, w_n, w_rm, w_sp) in want.items():
            r = rows[did]
            assert r["text"] == w_text, (mode, did, r["text"], w_text)
            assert r[cols[0]] == w_n
            assert r[cols[1]] == w_rm
            assert r["n_spans"] == w_sp

    def test_modes_match_python_model(self, spark):
        import numpy as np

        for seed in (0, 1, 2):
            rng = np.random.RandomState(seed)
            texts = []
            for _ in range(8):
                n = int(rng.randint(0, 40))
                toks = [
                    "w" + str(rng.randint(0, 4)) for _ in range(n)
                ]  # 4-word alphabet: heavy collisions
                texts.append(" ".join(toks))
            self._run_case(spark, texts, "token", window=3,
                           min_count=2, keep_first=bool(seed % 2), min_span=0)
            self._run_case(spark, texts, "token", window=2,
                           min_count=3, keep_first=True, min_span=5)
            chars = ["".join(rng.choice(list("abc xy")) for _ in range(int(rng.randint(0, 50)))) for _ in range(8)]
            self._run_case(spark, chars, "char", window=4,
                           min_count=2, keep_first=bool(seed % 2), min_span=0)
            sents = [
                "".join(
                    f"s{rng.randint(0, 3)} word{rng.randint(0, 3)}{'.!?'[rng.randint(0, 3)]} "
                    for _ in range(int(rng.randint(0, 8)))
                ).rstrip()
                for _ in range(8)
            ]
            self._run_case(spark, sents, "sentence", window=2,
                           min_count=2, keep_first=bool(seed % 2), min_span=0)
            lines = [
                "\n".join(
                    ["hdr", "menu line", "x", "body " + str(rng.randint(0, 3)),
                     "menu line", ""][: int(rng.randint(1, 7))]
                )
                for _ in range(8)
            ]
            self._run_case(spark, lines, "line", window=1,
                           min_count=2, keep_first=bool(seed % 2), min_span=0)
