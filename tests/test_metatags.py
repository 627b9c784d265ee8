"""<meta> tag triples (operators/metatags.py)."""

from search_spark.operators.metatags import meta_triples


def _triples(spark, html, url="https://x.test/a"):
    df = spark.createDataFrame([(url, html.encode())], "url string, html binary")
    return sorted((r.subj, r.pred, r.obj) for r in meta_triples(df).collect())


def test_property_wins_over_name(spark):
    got = _triples(
        spark, '<meta property="og:x" name="x" content="v"><meta name="y" content="w">'
    )
    assert got == [("https://x.test/a", "og:x", "v"), ("https://x.test/a", "y", "w")]


def test_drops_charset_and_empty_content(spark):
    got = _triples(
        spark,
        "<meta charset='utf-8'><meta name='d' content=''>"
        "<meta content='z' property='p'>",  # reversed attr order still works
    )
    assert got == [("https://x.test/a", "p", "z")]


def test_plan_is_shuffle_free(spark):
    from search_spark import oracles

    pages = spark.createDataFrame(
        oracles.meta_pages(), "url string, html binary"
    )
    plan = meta_triples(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan
