"""RSS/Atom feed items (operators/feeds.py) — cascades, date formats,
CDATA, and the shuffle-free plan."""

import datetime

from search_spark.operators.feeds import feed_items


def _items(spark, xml, url="https://f.test/feed"):
    df = spark.createDataFrame([(url, xml.encode())], "url string, html binary")
    return feed_items(df).orderBy("item_idx").collect()


def test_rss_item_fields(spark):
    xml = (
        "<rss><channel><item><title>Hello</title>"
        "<link>https://a.test/1</link><guid>g1</guid>"
        "<pubDate>Tue, 10 Feb 2026 08:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    (r,) = _items(spark, xml)
    assert (r.item_id, r.title, r.link) == ("g1", "Hello", "https://a.test/1")
    assert r.published_ts == datetime.datetime(2026, 2, 10, 8, 0)


def test_rfc822_numeric_offset(spark):
    xml = (
        "<rss><item><title>T</title><link>u</link>"
        "<pubDate>Wed, 11 Feb 2026 09:30:00 +0000</pubDate></item></rss>"
    )
    (r,) = _items(spark, xml)
    assert r.published_ts == datetime.datetime(2026, 2, 11, 9, 30)


def test_atom_entry_href_and_iso(spark):
    xml = (
        "<feed><entry><title><![CDATA[Wrapped]]></title>"
        "<link rel='alternate' href='https://b.test/x'/><id>aid</id>"
        "<updated>2026-02-12T10:15:00Z</updated></entry></feed>"
    )
    (r,) = _items(spark, xml)
    assert (r.item_id, r.title, r.link) == ("aid", "Wrapped", "https://b.test/x")
    assert r.published_ts == datetime.datetime(2026, 2, 12, 10, 15)


def test_id_falls_back_to_link_and_bad_date_null(spark):
    xml = (
        "<rss><item><title>A</title><link>https://c.test/9</link>"
        "<pubDate>garbage</pubDate></item></rss>"
    )
    (r,) = _items(spark, xml)
    assert r.item_id == "https://c.test/9"
    assert r.published_ts is None


def test_item_order_and_multiple(spark):
    xml = (
        "<rss>"
        "<item><title>one</title><link>l1</link></item>"
        "<item><title>two</title><link>l2</link></item>"
        "</rss>"
    )
    rows = _items(spark, xml)
    assert [(r.item_idx, r.title) for r in rows] == [(0, "one"), (1, "two")]


def test_plan_is_shuffle_free(spark):
    from search_spark import oracles

    pages = spark.createDataFrame(oracles.feed_pages(), "url string, html binary")
    plan = feed_items(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan
