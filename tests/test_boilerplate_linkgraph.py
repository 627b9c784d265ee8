"""Unit tests for frequency-based boilerplate removal and the anchor-text
link graph (operators/boilerplate.py, operators/linkgraph.py)."""

import pytest
from pyspark.sql import functions as F

from search_spark.operators.boilerplate import (
    clean_pages,
    host_of,
    mark_boilerplate,
    strip_boilerplate,
)
from search_spark.operators.linkgraph import anchor_alias_table, anchor_edges


def _paras(spark, rows):
    return spark.createDataFrame(
        rows, schema="url string, ppos int, text string"
    )


def test_mark_boilerplate_threshold(spark):
    # host a: 4 docs; banner in all 4 (flagged), rare in 1 (kept even
    # though min_df=1 would catch it — ratio gate), content unique.
    rows = []
    for i in range(4):
        url = f"https://a.org/{i}"
        rows.append((url, 0, "Cookie banner text"))
        rows.append((url, 1, f"unique content {i}"))
    rows.append(("https://a.org/0", 2, "rarely shared"))
    rows.append(("https://a.org/1", 2, "rarely shared"))
    marked = mark_boilerplate(
        _paras(spark, rows), ratio=0.75, min_df=2
    ).collect()
    flags = {(r.url, r.ppos): r.is_boilerplate for r in marked}
    assert all(flags[(f"https://a.org/{i}", 0)] for i in range(4))
    assert not any(flags[(f"https://a.org/{i}", 1)] for i in range(4))
    # df=2 of 4 docs < 0.75 ratio → kept
    assert not flags[("https://a.org/0", 2)]
    assert not flags[("https://a.org/1", 2)]


def test_boilerplate_is_per_host(spark):
    # identical banner on two hosts, but only host a crosses the ratio
    rows = [
        ("https://a.org/0", 0, "shared banner"),
        ("https://a.org/1", 0, "shared banner"),
        ("https://b.org/0", 0, "shared banner"),
        ("https://b.org/1", 0, "something else"),
        ("https://b.org/2", 0, "third thing"),
    ]
    kept = strip_boilerplate(
        _paras(spark, rows), ratio=0.6, min_df=2
    ).collect()
    urls = sorted(r.url for r in kept)
    assert urls == [
        "https://b.org/0",
        "https://b.org/1",
        "https://b.org/2",
    ]


def test_normalization_collapses_variants(spark):
    rows = [
        ("https://a.org/0", 0, "Cookie  Banner "),
        ("https://a.org/1", 0, "cookie banner"),
        ("https://a.org/0", 1, "content zero"),
        ("https://a.org/1", 1, "content one"),
    ]
    marked = mark_boilerplate(
        _paras(spark, rows), ratio=0.5, min_df=2
    ).collect()
    assert sorted(r.is_boilerplate for r in marked if r.ppos == 0) == [
        True,
        True,
    ]


def test_clean_pages_order_and_counts(spark):
    rows = [
        ("https://a.org/0", 0, "banner"),
        ("https://a.org/0", 1, "first"),
        ("https://a.org/0", 2, "second"),
        ("https://a.org/1", 0, "banner"),
        ("https://a.org/1", 1, "other"),
    ]
    out = {
        r.url: r
        for r in clean_pages(
            _paras(spark, rows), ratio=0.5, min_df=2
        ).collect()
    }
    r0 = out["https://a.org/0"]
    assert (r0.n_kept, r0.n_removed) == (2, 1)
    assert r0.clean_text == "first\nsecond"


def test_clean_pages_all_boilerplate_yields_empty_string(spark):
    rows = [
        ("https://a.org/0", 0, "banner"),
        ("https://a.org/1", 0, "banner"),
    ]
    out = clean_pages(_paras(spark, rows), ratio=0.5, min_df=2).collect()
    assert all(r.n_kept == 0 and r.clean_text == "" for r in out)


def test_host_of_column(spark):
    df = spark.createDataFrame(
        [("https://a.b.org:8080/x?q=1",), ("http://plain.org/",), ("noscheme.org/p",)],
        schema="url string",
    ).select(host_of("url").alias("h"))
    assert [r.h for r in df.collect()] == ["a.b.org", "plain.org", "noscheme.org"]


@pytest.fixture()
def link_pages(spark):
    rows = [
        (
            "https://a.org/dir/p1",
            b'<html><body>'
            b'<a href="https://b.org/x">Alpha Site</a>'
            b'<a href="/root">  alpha   site </a>'
            b'<a href="sub/q.html">Relative</a>'
            b'<a href="https://b.org/x"></a>'
            b"</body></html>",
        ),
        (
            "https://c.org/p2",
            b'<html><body><a href="https://b.org/x">alpha site</a>'
            b"</body></html>",
        ),
    ]
    return spark.createDataFrame(rows, schema="url string, html binary")


def test_anchor_edges_resolution(spark, link_pages):
    edges = {
        (r.src, r.dst, r.anchor) for r in anchor_edges(link_pages).collect()
    }
    assert ("https://a.org/dir/p1", "https://b.org/x", "Alpha Site") in edges
    assert ("https://a.org/dir/p1", "https://a.org/root", "  alpha   site ") in edges
    assert ("https://a.org/dir/p1", "https://a.org/dir/sub/q.html", "Relative") in edges
    assert ("https://c.org/p2", "https://b.org/x", "alpha site") in edges


def test_anchor_alias_table(spark, link_pages):
    rows = {
        (r.dst, r.anchor): (r.n_links, r.n_src_hosts)
        for r in anchor_alias_table(link_pages).collect()
    }
    # the two normalized-identical anchors to b.org/x come from two hosts;
    # the empty anchor is dropped
    assert rows[("https://b.org/x", "alpha site")] == (2, 2)
    assert rows[("https://a.org/root", "alpha site")] == (1, 1)
    assert ("https://b.org/x", "") not in rows


def test_anchor_extraction_is_jvm_only(spark, link_pages):
    plan = anchor_alias_table(link_pages)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_boilerplate_null_text_safe(spark):
    rows = [
        ("https://a.org/0", 0, None),
        ("https://a.org/0", 1, "content"),
        ("https://a.org/1", 0, None),
    ]
    marked = mark_boilerplate(
        _paras(spark, rows), ratio=0.5, min_df=2
    ).collect()
    # NULL-text rows get a NULL key; they must never be flagged
    assert all(not r.is_boilerplate for r in marked)


def test_anchor_prior_dictionary_argmax_and_prior(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.org/1",
                b'<a href="https://x.org/A">jaguar</a>'
                b'<a href="https://x.org/A">jaguar</a>'
                b'<a href="https://x.org/B">jaguar</a>',
            ),
            (
                "https://b.org/1",
                b'<a href="https://x.org/C">lynx</a>'
                b'<a href="https://x.org/D">lynx</a>',
            ),
        ],
        schema="url string, html binary",
    )
    from search_spark.operators.linkgraph import anchor_prior_dictionary

    d = {r.anchor: r for r in anchor_prior_dictionary(pages).collect()}
    assert d["jaguar"].dst == "https://x.org/A"
    assert (d["jaguar"].n_links, d["jaguar"].n_total) == (2, 3)
    assert d["jaguar"].prior_ppm == 666666
    # tie on count → lexicographic-min dst
    assert d["lynx"].dst == "https://x.org/C"
    assert d["lynx"].prior_ppm == 500000


def test_link_by_anchor_prior_unlinkable_is_null(spark):
    pages = spark.createDataFrame(
        [("https://a.org/1", b'<a href="https://x.org/A">known</a>')],
        schema="url string, html binary",
    )
    mentions = spark.createDataFrame(
        [(0, " KNOWN "), (1, "missing")], schema="mention_id int, mention string"
    )
    from search_spark.operators.linkgraph import link_by_anchor_prior

    rows = {
        r.mention_id: r
        for r in link_by_anchor_prior(mentions, pages).collect()
    }
    assert rows[0].dst == "https://x.org/A" and rows[0].prior_ppm == 1000000
    assert rows[1].dst is None and rows[1].prior_ppm is None


def _canon_pages(spark, tags):
    rows = [
        (url, f'<html><head><link rel="canonical" href="{href}"></head>'
              f"<body><p>x</p></body></html>".encode())
        if href is not None
        else (url, b"<html><head></head><body><p>x</p></body></html>")
        for url, href in tags
    ]
    return spark.createDataFrame(rows, schema="url string, html binary")


def test_tag_attribute_variants_single_quotes_and_order(spark):
    # live markup: single quotes, extra attributes, rel AFTER href —
    # all three extractors must still see the declarations
    from search_spark.operators.linkgraph import (
        anchor_edges,
        canonical_links,
        hreflang_edges,
    )

    html = (
        b"<html><head>"
        b"<link href='https://m.example/master' rel='canonical'>"
        b"<link hreflang='DE' rel=\"alternate\" "
        b"href='https://m.example/de'/>"
        b"</head><body>"
        b"<a class=x href='/about' id=y>About us</a>"
        b"</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://m.example/page", html)], schema="url string, html binary"
    )
    assert {(r.url, r.canonical) for r in canonical_links(pages).collect()} == {
        ("https://m.example/page", "https://m.example/master")
    }
    assert {
        (r.hreflang, r.alt_url) for r in hreflang_edges(pages).collect()
    } == {("de", "https://m.example/de")}
    assert {(r.dst, r.anchor) for r in anchor_edges(pages).collect()} == {
        ("https://m.example/about", "About us")
    }


def test_canonical_links_absolutize_and_self_filter(spark):
    from search_spark.operators.linkgraph import canonical_links

    pages = _canon_pages(
        spark,
        [
            ("https://a.org/p1", "https://a.org/master"),
            ("https://a.org/p2", "/master"),
            ("https://a.org/p3", "https://a.org/p3"),  # self → dropped
            ("https://a.org/p4", None),                # untagged → dropped
        ],
    )
    got = {(r.url, r.canonical) for r in canonical_links(pages).collect()}
    assert got == {
        ("https://a.org/p1", "https://a.org/master"),
        ("https://a.org/p2", "https://a.org/master"),
    }


def test_canonical_chain_resolution_long_chain(spark):
    from search_spark.operators.linkgraph import resolve_canonical_chains

    # chain of 9 pointers needs >3 doubling rounds (2^3 = 8 < 9)
    links = spark.createDataFrame(
        [(f"u{i}", f"u{i+1}") for i in range(9)],
        schema="url string, canonical string",
    )
    out = {r.url: (r.resolved, r.is_cycle)
           for r in resolve_canonical_chains(links, max_rounds=4).collect()}
    assert all(v == ("u9", False) for v in out.values())
    assert len(out) == 9


def test_canonical_cycles_flagged_with_null_resolution(spark):
    from search_spark.operators.linkgraph import resolve_canonical_chains

    links = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # even cycle
            ("p", "q"), ("q", "r"), ("r", "p"),  # odd cycle
            ("tail", "a"),                   # drains into the even cycle
            ("x", "y"),                      # clean 1-hop chain
        ],
        schema="url string, canonical string",
    )
    out = {r.url: (r.resolved, r.is_cycle)
           for r in resolve_canonical_chains(links).collect()}
    for u in ("a", "b", "p", "q", "r", "tail"):
        assert out[u] == (None, True), (u, out[u])
    assert out["x"] == ("y", False)


def test_hreflang_edges_drop_self_and_lowercase(spark):
    from search_spark.operators.linkgraph import hreflang_edges

    html = (
        b'<html><head>'
        b'<link rel="alternate" hreflang="en" href="https://a.org/en">'
        b'<link rel="alternate" hreflang="FR" href="https://a.org/fr">'
        b"</head></html>"
    )
    pages = spark.createDataFrame(
        [("https://a.org/en", html)], schema="url string, html binary"
    )
    got = {
        (r.hreflang, r.alt_url) for r in hreflang_edges(pages).collect()
    }
    assert got == {("fr", "https://a.org/fr")}  # self row dropped, lang lc


def test_hreflang_groups_distributed_path(spark):
    # chain declarations: en→fr→de; force the distributed CC path
    from search_spark.operators.canonicalize import connected_components
    from search_spark.operators.linkgraph import hreflang_edges

    def page(url, href):
        return (
            url,
            f'<html><head><link rel="alternate" hreflang="x" '
            f'href="{href}"></head></html>'.encode(),
        )

    pages = spark.createDataFrame(
        [
            page("https://a.org/en", "https://a.org/fr"),
            page("https://a.org/fr", "https://a.org/de"),
            page("https://b.org/1", "https://b.org/2"),
        ],
        schema="url string, html binary",
    )
    edges = hreflang_edges(pages).select(
        F.col("url").alias("src"), F.col("alt_url").alias("dst")
    )
    comp = {
        r.id: r.component
        for r in connected_components(edges, local_threshold=0).collect()
    }
    assert comp["https://a.org/en"] == "https://a.org/de"
    assert comp["https://a.org/de"] == "https://a.org/de"
    assert comp["https://b.org/2"] == "https://b.org/1"
