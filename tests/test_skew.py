"""Salting helpers: result equivalence + salt-spread sanity."""

from pyspark.sql import functions as F

from xarray_beam_spark import skew


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(300)], "k int, payload string"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (9, "z")], "k int, dim string")
    plain = sorted(
        (r["k"], r["payload"], r["dim"]) for r in big.join(small, on=["k"]).collect()
    )
    # sorted LISTS, not sets: the primary salting failure mode is each
    # logical match appearing `salt` times (replicating/salting the wrong
    # side) — a set comparison collapses exactly those duplicates
    salted = sorted(
        (r["k"], r["payload"], r["dim"])
        for r in skew.salted_join(big, small, on=["k"], salt=4).collect()
    )
    assert salted == plain
    assert len(salted) == 300  # every big row matched exactly once


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "x"), (7, "y")], "k int, payload string")
    small = spark.createDataFrame([(1, "a")], "k int, dim string")
    rows = sorted(
        (r["k"], r["dim"])
        for r in skew.salted_join(big, small, on=["k"], how="left").collect()
    )
    assert rows == [(1, "a"), (7, None)]


def test_salt_actually_spreads_hot_key(spark):
    df = spark.createDataFrame([(0,)] * 1000, "k int")
    spread = (
        skew.add_salt(df, 8)
        .groupBy(skew.SALT_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(spread) >= 6  # hot key split across most of the 8 salts
    assert max(r["n"] for r in spread) < 1000


def test_salted_count_equals_group_count(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(1000)], "k int")
    want = {(r["k"], r["count"]) for r in df.groupBy("k").count().collect()}
    got = {(r["k"], r["count"]) for r in skew.salted_count(df, ["k"]).collect()}
    assert got == want
