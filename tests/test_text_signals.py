"""Repetition / normalization signal edge cases (the oracle-parity suite
covers the bulk behavior; these pin the row-local corner semantics)."""

import math

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
