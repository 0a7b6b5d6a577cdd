"""Corpus-cleaning funnel: stage semantics + plan shape."""

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
