"""HTML microdata (schema.org ``itemscope``/``itemprop``) extraction.

The second of the two big schema.org embedding syntaxes on the open web
(JSON-LD is :mod:`search_spark.operators.jsonld`); a Common-Crawl-style KG
constructor needs both — a large share of product/article/recipe markup
ships as microdata attributes, not JSON-LD blocks. The reference has no
equivalent (curated article inputs).

Entirely JVM codegen — no UDF touches the page bytes:

1. the decoded page splits at every ``itemscope`` opening tag
   (zero-width lookahead split, so the tag stays with its segment),
2. ``posexplode`` emits one row per item segment; the segment head yields
   ``itemtype`` and (when present) ``itemid``,
3. ``regexp_extract_all`` pulls every ``itemprop`` tag *with its trailing
   text* from the segment; the property value resolves by the HTML
   microdata value rules, in order: ``content=`` attribute (meta tags),
   ``href=`` (a/link), ``src=`` (img/audio/video), else the element's
   immediate inner text,
4. subject cascade per item: ``itemid`` if present, else
   ``url#item<idx>`` — the same deterministic-identifier discipline as
   JSON-LD's ``@id > name > url#b<idx>``. ``itemtype`` emits an
   ``rdf:type`` triple; property rows with an empty name or value drop.

Scope (documented, like jsonld's flat-map scope): items are delimited by
the *next* ``itemscope`` opening — the sequential model. A nested item's
own properties attach to the nested item (correct); the linkage tag that
carries BOTH ``itemprop`` and ``itemscope`` (naming the child as a parent
property) is dropped rather than misattributed; a parent property
appearing *after* the nested item's close would attach to the nested item;
``itemref`` indirection is out of scope. Malformed attributes simply fail
their regex and drop — counted by the caller if needed, never crashed.

Scale: the split + regex scans are part of the page-scan stage (no
shuffle); output is triple rows — any shuffle belongs to the caller's
downstream aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# zero-width lookahead: split BEFORE each tag that carries itemscope
_SPLIT_RE = r"(?=<[a-zA-Z][^>]*\bitemscope\b)"
# itemprop tag + its immediate inner text (up to the next tag)
_PROP_TAG_RE = r"(<[a-zA-Z][^>]*\bitemprop\s*=[^>]*>[^<]*)"


def _attr(col, name: str):
    """Extract an HTML attribute value from tag text; '' when absent.
    Accepts either quote style and any attribute order; the leading
    ``\\b`` keeps ``itemtype`` from matching inside ``xitemtype``."""
    return F.regexp_extract(
        col, r"\b" + name + r"""\s*=\s*["']([^"']*)["']""", 1
    )


def microdata_items(web_pages: DataFrame) -> DataFrame:
    """``(url, item_idx, itemtype, itemid, segment)`` — one row per
    ``itemscope`` on the page. ``item_idx`` counts items per page in
    document order; ``itemid``/``itemtype`` are '' when absent.

    The non-item preamble segment is filtered out of the split array
    *before* posexplode, so ``pos`` is already the dense per-page item
    index — no window, no shuffle."""
    html_s = F.decode(F.col("html"), "UTF-8")
    item_segs = F.filter(
        F.split(html_s, _SPLIT_RE),
        lambda s: s.rlike(r"^<[a-zA-Z][^>]*\bitemscope\b"),
    )
    segs = web_pages.select(
        "url", F.posexplode(item_segs).alias("item_idx", "segment")
    )
    head = F.regexp_extract(F.col("segment"), r"^(<[^>]*>)", 1)
    return segs.select(
        "url",
        "item_idx",
        "segment",
        _attr(head, "itemtype").alias("itemtype"),
        _attr(head, "itemid").alias("itemid"),
    )


def microdata_triples(web_pages: DataFrame) -> DataFrame:
    """Microdata items → ``(subj, pred, obj, prov)`` triples."""
    items = microdata_items(web_pages).withColumn(
        "subj",
        F.when(F.col("itemid") != "", F.col("itemid")).otherwise(
            F.concat(F.col("url"), F.lit("#item"), F.col("item_idx"))
        ),
    ).withColumn("prov", F.concat(F.col("url"), F.lit("#item"), F.col("item_idx")))

    type_rows = items.filter(F.col("itemtype") != "").select(
        "subj", F.lit("rdf:type").alias("pred"), F.col("itemtype").alias("obj"), "prov"
    )

    tags = items.select(
        "subj",
        "prov",
        F.explode(
            F.regexp_extract_all(F.col("segment"), F.lit(_PROP_TAG_RE), F.lit(1))
        ).alias("tag_txt"),
    ).filter(
        # a tag carrying BOTH itemprop and itemscope is nested-item
        # linkage (the property's value is the child item, not this
        # element) — parent linkage is out of scope: drop it rather than
        # misattribute it to the child subject (see module docstring)
        ~F.col("tag_txt").rlike(r"\bitemscope\b")
    )
    tag = F.regexp_extract(F.col("tag_txt"), r"^(<[^>]*>)", 1)
    inner = F.trim(F.regexp_extract(F.col("tag_txt"), r">([^<]*)$", 1))
    prop_rows = tags.select(
        "subj",
        _attr(tag, "itemprop").alias("pred"),
        F.coalesce(
            F.nullif(_attr(tag, "content"), F.lit("")),
            F.nullif(_attr(tag, "href"), F.lit("")),
            F.nullif(_attr(tag, "src"), F.lit("")),
            F.nullif(inner, F.lit("")),
        ).alias("obj"),
        "prov",
    ).filter((F.col("pred") != "") & F.col("obj").isNotNull())

    return type_rows.unionByName(prop_rows)
