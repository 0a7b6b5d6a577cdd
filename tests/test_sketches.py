"""Sketch invariants: CMS overestimate/merge, Bloom no-false-negatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from xarray_beam_spark.operators import sketches as sk


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


class TestCountMin:
    def test_estimate_upper_bounds_truth(self, spark):
        vals = [f"u{i % 37}" for i in range(500)] + ["hot"] * 200
        df = _keys(spark, vals)
        cms = sk.cms_build(df, "k", width=64, depth=4)
        keys = df.distinct()
        est = {r["k"]: r["est"] for r in sk.cms_estimate(cms, keys, "k", 64, 4).collect()}
        true = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
        assert all(est[k] >= true[k] for k in true)  # CMS never undercounts
        assert est["hot"] >= 200

    def test_exact_when_wide(self, spark):
        vals = [f"u{i % 10}" for i in range(100)]
        df = _keys(spark, vals)
        cms = sk.cms_build(df, "k", width=4096, depth=4)
        est = {
            r["k"]: r["est"]
            for r in sk.cms_estimate(cms, df.distinct(), "k", 4096, 4).collect()
        }
        assert est == {f"u{i}": 10 for i in range(10)}

    def test_sketches_merge_by_union_groupby(self, spark):
        """CMS(a ∪ b) == merge(CMS(a), CMS(b)) — the distributed-combine
        property the group-by build relies on."""
        a = _keys(spark, [f"x{i % 7}" for i in range(70)])
        b = _keys(spark, [f"x{i % 5}" for i in range(50)])
        whole = sk.cms_build(a.union(b), "k", width=32, depth=3)
        merged = (
            sk.cms_build(a, "k", width=32, depth=3)
            .union(sk.cms_build(b, "k", width=32, depth=3))
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    def test_sketch_size_bounded(self, spark):
        df = _keys(spark, [f"u{i}" for i in range(1000)])
        cms = sk.cms_build(df, "k", width=16, depth=2)
        assert cms.count() <= 16 * 2

    def test_unknown_key_estimates_from_zero_buckets(self, spark):
        df = _keys(spark, ["a", "b"])
        cms = sk.cms_build(df, "k", width=1 << 20, depth=4)
        est = {
            r["k"]: r["est"]
            for r in sk.cms_estimate(cms, _keys(spark, ["zzz"]), "k", 1 << 20, 4).collect()
        }
        assert est["zzz"] == 0  # wide enough that no probe collides


class TestBloom:
    def test_no_false_negatives(self, spark):
        members = [f"gram-{i}" for i in range(300)]
        bloom = sk.bloom_build(_keys(spark, members), "k", m_bits=1 << 12, k_hashes=4)
        got = {
            r["k"]: r["maybe_member"]
            for r in sk.bloom_contains(bloom, _keys(spark, members), "k", 1 << 12, 4).collect()
        }
        assert all(got.values())  # every true member reports maybe=True

    def test_false_positive_rate_sane(self, spark):
        members = [f"gram-{i}" for i in range(300)]
        others = [f"other-{i}" for i in range(1000)]
        bloom = sk.bloom_build(_keys(spark, members), "k", m_bits=1 << 14, k_hashes=4)
        got = sk.bloom_contains(bloom, _keys(spark, others), "k", 1 << 14, 4)
        fp = got.where(F.col("maybe_member")).count()
        # m=16384, n=300, k=4 -> theoretical FP ~ (1-e^{-kn/m})^k ~ 3e-5
        assert fp <= 5

    def test_bits_bounded_and_mergeable(self, spark):
        a = _keys(spark, [f"a{i}" for i in range(50)])
        b = _keys(spark, [f"b{i}" for i in range(50)])
        whole = sk.bloom_build(a.union(b), "k", m_bits=256, k_hashes=3)
        merged = (
            sk.bloom_build(a, "k", m_bits=256, k_hashes=3)
            .union(sk.bloom_build(b, "k", m_bits=256, k_hashes=3))
            .distinct()
        )
        assert whole.count() <= 256
        assert sorted(r["bit"] for r in whole.collect()) == sorted(
            r["bit"] for r in merged.collect()
        )


class TestHyperLogLog:
    def test_estimate_accuracy(self, spark):
        """~6.5% relative error at m=256 — allow 3 sigma."""
        n = 5000
        df = _keys(spark, [f"user-{i}" for i in range(n)])
        regs = sk.hll_build(df, "k")
        est = sk.hll_estimate(regs).collect()[0]["est"]
        assert abs(est - n) / n < 0.2

    def test_registers_merge_by_union_max(self, spark):
        a = _keys(spark, [f"a{i}" for i in range(400)])
        b = _keys(spark, [f"a{i}" for i in range(200, 600)])  # overlapping
        whole = sk.hll_build(a.union(b), "k")
        merged = (
            sk.hll_build(a, "k")
            .union(sk.hll_build(b, "k"))
            .groupBy("bucket")
            .agg(F.max("reg").alias("reg"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    def test_duplicates_do_not_move_estimate(self, spark):
        once = _keys(spark, [f"k{i}" for i in range(300)])
        many = _keys(spark, [f"k{i % 300}" for i in range(3000)])
        e1 = sk.hll_estimate(sk.hll_build(once, "k")).collect()[0]["est"]
        e2 = sk.hll_estimate(sk.hll_build(many, "k")).collect()[0]["est"]
        assert e1 == e2  # cardinality, not count: bit-identical registers

    def test_grouped_registers_bounded(self, spark):
        rows = [(f"t{i % 3}", f"u{i}") for i in range(2000)]
        df = spark.createDataFrame(rows, "t string, k string")
        regs = sk.hll_build(df, "k", ["t"])
        per = {r["t"]: r["c"] for r in regs.groupBy("t").agg(F.count("*").alias("c")).collect()}
        assert all(c <= 256 for c in per.values())


class TestBloomInline:
    def test_inline_matches_join_path(self, spark):
        """bloom_contains_expr (shuffle-free literal-bitmask projection)
        must agree with bloom_contains (broadcast join path) on every
        key — same bits, same probes, two execution strategies."""
        keys = spark.createDataFrame(
            [(f"key number {i}",) for i in range(300)], "k string"
        )
        members = keys.where(F.length("k") % 3 == 0)
        bloom = sk.bloom_build(members, "k", 1 << 10, 3)
        joined = {
            r["k"]: r["maybe_member"]
            for r in sk.bloom_contains(bloom, keys, "k", 1 << 10, 3).collect()
        }
        words = sk.bloom_bitmask(bloom, 1 << 10)
        inline = {
            r["k"]: r["m"]
            for r in keys.select(
                "k", sk.bloom_contains_expr(words, F.col("k"), 1 << 10, 3).alias("m")
            ).collect()
        }
        assert inline == joined and len(inline) == 300
        # no false negatives, ever
        for r in members.collect():
            assert inline[r["k"]] is True

    def test_inline_plan_is_shuffle_free(self, spark):
        """The membership projection must add NO exchange and NO join to
        the plan — that is its entire reason to exist."""
        keys = spark.range(100).select(F.col("id").cast("string").alias("k"))
        words = sk.bloom_bitmask(
            sk.bloom_build(keys.limit(10), "k", 1 << 10, 3), 1 << 10
        )
        df = keys.select(sk.bloom_contains_expr(words, F.col("k"), 1 << 10, 3).alias("m"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan, plan

    def test_inline_cap_raises(self, spark):
        import pytest

        bloom = sk.bloom_build(
            spark.createDataFrame([("x",)], "k string"), "k", 1 << 10, 2
        )
        with pytest.raises(ValueError, match="inline bloom capped"):
            sk.bloom_bitmask(bloom, 1 << 20)


def test_hll_w_zero_key_does_not_corrupt_estimate(spark):
    """Keys whose 32-bit md5 slice is < 256 (w == 0; p ~ 2^-24 per key —
    inevitable at scale) used to set rank WBITS+1, making the dyadic sum
    shiftleft(1, -1) = LONG_MIN and the estimate garbage. Capped at
    WBITS, the estimate stays within normal HLL error."""
    from xarray_beam_spark.operators.sketches import hll_build, hll_estimate

    # 1946096's md5('xbs-hll:…') low-32 slice is < 256 (found by search)
    keys = [1946096] + list(range(100))
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    est = hll_estimate(hll_build(df, "user_id")).collect()[0]["est"]
    assert 0 < est < 400, est  # was hugely negative before the cap
