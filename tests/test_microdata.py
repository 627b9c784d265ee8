"""Microdata extraction (operators/microdata.py) — value rules, subject
cascade, nested-linkage drop, and the shuffle-free plan."""

from pyspark.sql import functions as F

from search_spark.operators.microdata import microdata_items, microdata_triples


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def _triples(spark, html: str, url: str = "https://x.test/p"):
    out = microdata_triples(_pages(spark, [(url, html.encode())]))
    return sorted((r.subj, r.pred, r.obj) for r in out.collect())


def test_value_rules_content_href_src_text(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">Gadget</span>'
        '<meta itemprop="sku" content="S-1">'
        '<a itemprop="url" href="/p/1">more</a>'
        '<img itemprop="image" src="/i.png">'
        "</div>"
    )
    got = _triples(spark, html)
    subj = "https://x.test/p#item0"
    assert got == sorted(
        [
            (subj, "rdf:type", "https://schema.org/Product"),
            (subj, "name", "Gadget"),
            (subj, "sku", "S-1"),
            (subj, "url", "/p/1"),
            (subj, "image", "/i.png"),
        ]
    )


def test_itemid_wins_subject_cascade(spark):
    html = (
        "<p>pre</p><div itemscope itemid='urn:x:9' itemtype='T'>"
        "<span itemprop='a'>v</span></div>"
    )
    got = _triples(spark, html)
    assert got == sorted([("urn:x:9", "rdf:type", "T"), ("urn:x:9", "a", "v")])


def test_empty_values_and_empty_prop_drop(spark):
    html = (
        '<div itemscope><span itemprop="empty"></span>'
        '<meta itemprop="e2" content="">'
        '<span itemprop="ok">  padded  </span></div>'
    )
    got = _triples(spark, html)
    assert got == [("https://x.test/p#item0", "ok", "padded")]


def test_untyped_item_has_no_rdf_type(spark):
    got = _triples(spark, "<div itemscope><b itemprop='k'>v</b></div>")
    assert got == [("https://x.test/p#item0", "k", "v")]


def test_nested_linkage_tag_dropped_child_props_attach_to_child(spark):
    html = (
        '<div itemscope itemtype="P"><span itemprop="n">parent</span>'
        '<div itemprop="maker" itemscope itemtype="O">'
        '<span itemprop="n">child</span></div></div>'
    )
    got = _triples(spark, html)
    assert got == sorted(
        [
            ("https://x.test/p#item0", "rdf:type", "P"),
            ("https://x.test/p#item0", "n", "parent"),
            ("https://x.test/p#item1", "rdf:type", "O"),
            ("https://x.test/p#item1", "n", "child"),
        ]
    )


def test_item_indices_dense_despite_preamble(spark):
    html = (
        "<html><body><h1>t</h1>"
        "<div itemscope itemtype='A'><i itemprop='x'>1</i></div>"
        "<div itemscope itemtype='B'><i itemprop='x'>2</i></div>"
        "</body></html>"
    )
    items = microdata_items(
        _pages(spark, [("u", html.encode())])
    ).orderBy("item_idx")
    assert [(r.item_idx, r.itemtype) for r in items.collect()] == [
        (0, "A"),
        (1, "B"),
    ]


def test_page_without_microdata_emits_nothing(spark):
    out = microdata_triples(
        _pages(spark, [("u", b"<html><p>plain</p></html>")])
    )
    assert out.count() == 0


def test_extraction_is_shuffle_free_codegen(spark):
    from search_spark import oracles

    pages = _pages(spark, oracles.microdata_pages())
    plan = microdata_triples(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
