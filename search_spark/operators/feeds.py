"""RSS 2.0 / Atom feed-item extraction — discovery input for the crawler.

Feeds are how a crawl scheduler (operators/crawl.py consumes sitemap
frontiers today) discovers fresh URLs with publish times attached; a
Common-Crawl-style corpus carries millions of them. This extractor turns
a fetched feed document into ``(feed_url, item_idx, item_id, title, link,
published_ts)`` rows — the same frontier shape ``sitemap_frontier``
emits, so the two sources union.

Entirely JVM codegen:

1. ``regexp_extract_all`` with dotall non-greedy bodies pulls ``<item>``
   (RSS) and ``<entry>`` (Atom) blocks; the two arrays concatenate so a
   feed of either flavor explodes once,
2. field regexes resolve per block: title; link (RSS ``<link>text</link>``
   wins, else Atom ``<link href=…>``); id (RSS ``<guid>``, Atom
   ``<id>``, else link); date (RSS ``<pubDate>`` RFC-822, Atom
   ``<updated>``/``<published>`` ISO-8601),
3. dates parse with ``try_to_timestamp`` (ANSI-safe: malformed dates are
   NULL, never a scan abort). RFC-822's weekday prefix and ``GMT``/UT
   offset suffix strip first — Spark's post-3.0 parser rejects ``EEE``
   patterns; offsets parse via ``X``/``Z`` patterns. CDATA-wrapped titles
   unwrap; other entities pass through verbatim (documented).

Scale: pure scan-stage work, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ITEM_RE = r"(?s)<item[\s>](.*?)</item>"
_ENTRY_RE = r"(?s)<entry[\s>](.*?)</entry>"


def _tag_text(body: Column, tag: str) -> Column:
    """Inner text of the first ``<tag>…</tag>`` in the block, CDATA
    unwrapped and trimmed; '' when absent."""
    raw = F.regexp_extract(body, rf"(?s)<{tag}[^>]*>(.*?)</{tag}>", 1)
    un_cdata = F.regexp_replace(raw, r"(?s)^\s*<!\[CDATA\[(.*?)\]\]>\s*$", "$1")
    return F.trim(un_cdata)


def _parse_date(raw: Column) -> Column:
    """RFC-822 ('Mon, 05 Jan 2026 10:30:00 GMT' / '+0000') or ISO-8601
    ('2026-01-05T10:30:00Z') → timestamp; NULL when unparseable."""
    rfc = F.regexp_replace(raw, r"^[A-Za-z]{3},\s*", "")
    return F.coalesce(
        F.try_to_timestamp(
            F.regexp_replace(rfc, r"\s+(GMT|UTC?)$", ""),
            F.lit("dd MMM yyyy HH:mm:ss"),
        ),
        F.try_to_timestamp(rfc, F.lit("dd MMM yyyy HH:mm:ss X")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ssX")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSX")),
    )


def feed_items(feeds: DataFrame) -> DataFrame:
    """``(feed_url, item_idx, item_id, title, link, published_ts)`` —
    one row per item/entry, ``item_idx`` in document order. ``feeds``
    needs ``url`` and binary ``html`` (the fetched feed body, reusing
    the web-page table shape)."""
    xml = F.decode(F.col("html"), "UTF-8")
    blocks = F.concat(
        F.regexp_extract_all(xml, F.lit(_ITEM_RE), F.lit(1)),
        F.regexp_extract_all(xml, F.lit(_ENTRY_RE), F.lit(1)),
    )
    items = feeds.select(
        F.col("url").alias("feed_url"),
        F.posexplode(blocks).alias("item_idx", "body"),
    )
    body = F.col("body")
    link = F.coalesce(
        F.nullif(_tag_text(body, "link"), F.lit("")),
        F.nullif(
            F.regexp_extract(
                body, r"""<link\b[^>]*\bhref\s*=\s*["']([^"']*)["']""", 1
            ),
            F.lit(""),
        ),
    )
    item_id = F.coalesce(
        F.nullif(_tag_text(body, "guid"), F.lit("")),
        F.nullif(_tag_text(body, "id"), F.lit("")),
        link,
    )
    date_raw = F.coalesce(
        F.nullif(_tag_text(body, "pubDate"), F.lit("")),
        F.nullif(_tag_text(body, "updated"), F.lit("")),
        F.nullif(_tag_text(body, "published"), F.lit("")),
    )
    return items.select(
        "feed_url",
        "item_idx",
        item_id.alias("item_id"),
        F.nullif(_tag_text(body, "title"), F.lit("")).alias("title"),
        link.alias("link"),
        _parse_date(date_raw).alias("published_ts"),
    )
