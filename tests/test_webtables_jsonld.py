"""Unit tests for web-table mining and JSON-LD extraction."""

from search_spark.operators.jsonld import jsonld_blocks, jsonld_triples
from search_spark.operators.webtables import (
    cells_to_triples,
    table_cells,
    webtable_triples,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, schema="url string, html binary")


def test_table_cells_header_and_body(spark):
    html = (
        b"<html><body><table>"
        b"<tr><th>item</th><th>color</th></tr>"
        b"<tr><td>apple</td><td>red</td></tr>"
        b"<tr><td>sky</td><td>blue</td></tr>"
        b"</table></body></html>"
    )
    cells = table_cells(_pages(spark, [("u", html)])).collect()
    got = {(r.t_idx, r.r_idx, r.c_idx, r.is_header, r.text) for r in cells}
    assert (0, 0, 0, True, "item") in got
    assert (0, 1, 1, False, "red") in got
    assert (0, 2, 0, False, "sky") in got
    assert len(got) == 6


def test_nested_table_rows_stay_with_inner_table(spark):
    # a table inside a cell: its rows must NOT inflate the outer table's
    # row numbering, and it gets its own t_idx; the outer cell's text
    # flattens the nested content
    html = (
        b"<html><body><table>"
        b"<tr><th>k</th><th>v</th></tr>"
        b"<tr><td>outer</td><td>"
        b"<table><tr><td>inner</td></tr></table>"
        b"</td></tr>"
        b"<tr><td>last</td><td>x</td></tr>"
        b"</table></body></html>"
    )
    cells = table_cells(_pages(spark, [("u", html)])).collect()
    got = {(r.t_idx, r.r_idx, r.c_idx, r.text) for r in cells}
    # outer table rows number 0,1,2 despite the nested <tr>
    assert (0, 2, 0, "last") in got
    # inner table is its own table 1, row 0
    assert (1, 0, 0, "inner") in got
    # the containing cell flattened the inner text
    assert (0, 1, 1, "inner") in got


def test_webtable_triples_shape(spark):
    html = (
        b"<table><tr><th>item</th><th>color</th><th>price</th></tr>"
        b"<tr><td>apple</td><td>red</td><td></td></tr></table>"
    )
    triples = {
        (r.subj, r.pred, r.obj, r.prov)
        for r in webtable_triples(_pages(spark, [("u", html)])).collect()
    }
    # empty price cell drops its triple; color survives
    assert triples == {("apple", "color", "red", "u#t0:r1")}


def test_headerless_table_yields_cells_not_triples(spark):
    html = b"<table><tr><td>a</td><td>b</td></tr></table>"
    pages = _pages(spark, [("u", html)])
    assert table_cells(pages).count() == 2
    assert webtable_triples(pages).count() == 0


def test_tag_soup_recovers_cells(spark):
    # unclosed table/tr: the tolerant walker recovers the cell (the old
    # ElementTree kernel dropped the whole page — real web pages are tag
    # soup, so total-drop was a silent coverage hole)
    pages = _pages(spark, [("u", b"<table><tr><td>a</td>")])
    got = table_cells(pages).collect()
    assert [(r.t_idx, r.r_idx, r.c_idx, r.text) for r in got] == [(0, 0, 0, "a")]


def test_real_world_html_is_not_dropped(spark):
    # void tags, bare attributes and &nbsp; are routine on real pages and
    # are not valid XML — the table must still extract
    html = (
        b'<html><head><meta charset="utf-8"><meta property="og:t" content="x">'
        b"</head><body><img src=/logo.png><br>"
        b'<div itemscope itemtype="T"><span itemprop="p">v</span></div>'
        b"<table><tr><th>k</th></tr><tr><td>a&nbsp;b</td></tr></table>"
        b"</body></html>"
    )
    got = {
        (r.r_idx, r.c_idx, r.is_header, r.text)
        for r in table_cells(_pages(spark, [("u", html)])).collect()
    }
    assert got == {(0, 0, True, "k"), (1, 0, False, "a b")}


def test_cell_text_normalizes_whitespace_and_markup(spark):
    html = b"<table><tr><th>k</th></tr><tr><td>  a  <b>b</b>\nc </td></tr></table>"
    cells = {r.text for r in table_cells(_pages(spark, [("u", html)])).collect()}
    assert "a b c" in cells


def test_jsonld_subject_cascade(spark):
    html = (
        b'<html><head>'
        b'<script type="application/ld+json">'
        b'{"@type": "P", "@id": "x:1", "name": "N", "k": "v"}</script>'
        b'<script type="application/ld+json">'
        b'{"@type": "P", "name": "OnlyName"}</script>'
        b'<script type="application/ld+json">{"@type": "P"}</script>'
        b"</head></html>"
    )
    t = jsonld_triples(_pages(spark, [("u", html)])).collect()
    subj_by_prov = {r.prov: r.subj for r in t}
    assert subj_by_prov["u#b0"] == "x:1"
    assert subj_by_prov["u#b1"] == "OnlyName"
    assert subj_by_prov["u#b2"] == "u#b2"
    # @-keys other than @type never become predicates
    assert not any(r.pred.startswith("@") for r in t)
    assert {r.pred for r in t if r.prov == "u#b0"} == {
        "rdf:type",
        "name",
        "k",
    }


def test_jsonld_script_attribute_variants(spark):
    # extra attributes, single quotes, whitespace around '=' — all the
    # forms live markup uses around the type attribute
    html = (
        b"<html><head>"
        b"<script async type='application/ld+json' nonce=\"x\">"
        b'{"@type": "Thing", "name": "a"}</script>'
        b'<script type = "application/ld+json">'
        b'{"@type": "Thing", "name": "b"}</script>'
        b"</head></html>"
    )
    blocks = jsonld_blocks(_pages(spark, [("u", html)])).collect()
    assert len(blocks) == 2
    names = {r.b_idx for r in blocks}
    assert names == {0, 1}


def test_jsonld_malformed_block_filtered_but_indexed(spark):
    html = (
        b'<script type="application/ld+json">{oops}</script>'
        b'<script type="application/ld+json">{"@type": "T"}</script>'
    )
    pages = _pages(spark, [("u", html)])
    assert jsonld_blocks(pages).count() == 2
    t = jsonld_triples(pages).collect()
    assert [(r.subj, r.obj) for r in t] == [("u#b1", "T")]


def test_schema_induction_majority_and_ties(spark):
    from search_spark.operators.schema_induction import (
        induce_predicate_types,
        value_type_col,
    )
    from pyspark.sql import functions as F

    rows = [
        ("p_price", "12.50"), ("p_price", "3.99"), ("p_price", "oops"),
        ("p_year", "2024"), ("p_year", "1999"),
        ("p_when", "2024-01-31"),
        ("p_link", "https://x.org/a"),
        ("p_mixed", "1"), ("p_mixed", "x"),  # 1-1 tie → lexicographic min
    ]
    t = spark.createDataFrame(rows, schema="pred string, obj string")
    out = {
        r.pred: (r.inferred_type, r.n_majority, r.n_values, r.agreement_ppm)
        for r in induce_predicate_types(t).collect()
    }
    assert out["p_price"] == ("decimal", 2, 3, 666666)
    assert out["p_year"] == ("integer", 2, 2, 1000000)
    assert out["p_when"] == ("date", 1, 1, 1000000)
    assert out["p_link"] == ("url", 1, 1, 1000000)
    assert out["p_mixed"][0] == "integer"  # 'integer' < 'text'
    # classifier sanity: negative decimal, bare text
    got = (
        spark.createDataFrame([("-4.2",), ("n/a",)], schema="obj string")
        .select(value_type_col("obj").alias("t"))
        .collect()
    )
    assert [r.t for r in got] == ["decimal", "text"]
