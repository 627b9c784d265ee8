"""Anchor-text link graph over raw web-page HTML — zero-UDF extraction.

Common-Crawl KG construction mines ``<a href>`` anchors for two signals the
reference pipeline gets from curated metadata instead:

* the **link graph** (src → dst edges) that feeds PageRank/HITS-style
  authority scores over pages, and
* the **anchor alias table**: the texts other pages use when linking to a
  target are surface forms for the entity that target denotes — the classic
  web-scale complement to the ontology alias list the reference's entity
  linker scores against (SURVEY.md §2.10, mining/entity.py's pattern lists).

Everything here is JVM codegen: ``decode`` + ``regexp_extract_all`` +
``explode`` + ``regexp_extract`` — the per-page anchor scan never crosses
into Python, so at 10^12 pages the extraction cost is the parquet scan
itself.  Href resolution handles absolute and root-relative links (the two
forms that survive Common-Crawl normalization); directory-relative hrefs
resolve against the source url's directory.

Skew: hub targets (home pages) concentrate edges on few ``dst`` keys; both
aggregations below are plain hash aggregates with map-side partial
aggregation, so a hot ``dst`` costs one partial row per task — no salting
needed until a single (dst, anchor) group's *output* row count matters,
which it never does (output is one row per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_spark.operators.boilerplate import host_of

# one full anchor tag per array element; href/text picked apart afterwards.
# Either quote style and any attribute order/extras around href.
_TAG_RE = "<a\\s[^>]*href\\s*=\\s*(\"[^\"]*\"|'[^']*')[^>]*>[^<]*</a>"
_HREF_RE = "href\\s*=\\s*[\"']([^\"']*)[\"']"


def anchor_edges(web_pages: DataFrame) -> DataFrame:
    """``(src, dst, anchor)`` edges from raw html, one row per anchor tag.

    ``dst`` is the absolutized href; ``anchor`` is the raw inner text.
    """
    html_s = F.decode(F.col("html"), "UTF-8")
    tags = F.regexp_extract_all(html_s, F.lit(_TAG_RE), F.lit(0))
    e = web_pages.select(
        F.col("url").alias("src"), F.explode(tags).alias("tag")
    )
    href = F.regexp_extract("tag", _HREF_RE, 1)
    anchor = F.regexp_extract("tag", ">([^<]*)</a>", 1)
    scheme = F.regexp_extract("src", "^([a-z][a-z0-9+.-]*)://", 1)
    base_dir = F.regexp_extract("src", "^(.*/)", 1)
    dst = (
        F.when(href.rlike("^[a-z][a-z0-9+.-]*://"), href)
        .when(
            href.startswith("/"),
            F.concat(scheme, F.lit("://"), host_of("src"), href),
        )
        .otherwise(F.concat(base_dir, href))
    )
    return e.select("src", dst.alias("dst"), anchor.alias("anchor")).filter(
        F.col("dst") != ""
    )


def norm_anchor(col) -> "F.Column":
    """Anchor-text surface-form key: lowercase, trim, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def anchor_alias_table(web_pages: DataFrame) -> DataFrame:
    """Per-target surface-form table: ``(dst, anchor, n_links, n_src_hosts)``.

    ``n_src_hosts`` (distinct linking hosts) is the trust signal — an alias
    used across many hosts is a stronger surface form than one repeated by
    a single template (same rationale as cross-document majority voting in
    the reference's attribute extraction).
    """
    edges = anchor_edges(web_pages)
    return (
        edges.select(
            "dst",
            norm_anchor("anchor").alias("anchor"),
            host_of("src").alias("src_host"),
        )
        .filter(F.col("anchor") != "")
        .groupBy("dst", "anchor")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src_host").alias("n_src_hosts"),
        )
    )


def anchor_prior_dictionary(web_pages: DataFrame) -> DataFrame:
    """Commonness dictionary: for each normalized anchor surface form, the
    most-linked target plus exact-integer prior evidence.

    ``P(dst | anchor)`` — the fraction of the anchor's links that point at
    the winning target — is the classic web-KG disambiguation prior
    (Wikipedia "commonness"); it complements the reference's
    embedding-similarity linker (SURVEY.md §2.10) with a signal that only
    exists at web scale.  The argmax is the portable two-step (max link
    count per anchor, then min dst at that count) so Spark and the DuckDB
    oracle trace identically; the prior ships as exact integers
    (``n_links``, ``n_total``, ``prior_ppm = n_links*1e6 div n_total``) —
    no cross-engine float rounding.

    Scale: one extra hash aggregation and a self-equi-join per anchor key on
    top of :func:`anchor_alias_table`; anchors are near-unique keys, so no
    skew concern beyond the alias table's own.
    """
    aliases = anchor_alias_table(web_pages)
    totals = aliases.groupBy("anchor").agg(
        F.sum("n_links").alias("n_total")
    )
    best = (
        aliases.groupBy("anchor")
        .agg(F.max("n_links").alias("n_links"))
        .join(aliases, ["anchor", "n_links"])
        .groupBy("anchor", "n_links")
        .agg(F.min("dst").alias("dst"))
    )
    return best.join(totals, "anchor").select(
        "anchor",
        "dst",
        F.col("n_links").cast("long").alias("n_links"),
        F.col("n_total").cast("long").alias("n_total"),
        F.floor(F.col("n_links") * F.lit(1_000_000) / F.col("n_total"))
        .cast("long")
        .alias("prior_ppm"),
    )


def link_by_anchor_prior(
    mentions: DataFrame, web_pages: DataFrame
) -> DataFrame:
    """Left-link mention rows to targets via the anchor-prior dictionary.

    Input needs a ``mention`` string column; all other columns pass
    through.  Unlinkable surface forms keep NULL ``dst``/prior columns (the
    downstream triple stage treats them as NaE, same as the reference's
    unlinked mentions).  The dictionary side is anchor-vocabulary sized —
    AQE broadcasts it when it fits; no forced hint (VERDICT r2 item 1).
    """
    dictionary = anchor_prior_dictionary(web_pages)
    m = mentions.withColumn("surface", norm_anchor("mention"))
    return m.join(
        dictionary, m["surface"] == dictionary["anchor"], "left"
    ).drop("anchor")


# --------------------------------------------------------------------------
# rel=canonical extraction + chain resolution
# --------------------------------------------------------------------------

# all <link ...> tags; rel/hreflang/href are picked out per tag so the
# attribute ORDER never matters (live markup mixes it freely)
_LINK_TAG_RE = "<link\\s[^>]*>"


def _rel_is(tag_col, value: str):
    return tag_col.rlike(f"rel\\s*=\\s*[\"']{value}[\"']")


def canonical_links(web_pages: DataFrame) -> DataFrame:
    """``(url, canonical)`` from ``<link rel="canonical">`` headers — the
    site-declared dedup signal Common-Crawl dedup keys on before any
    content hashing.  Pure codegen (first canonical tag per page, found
    array-natively: all ``<link>`` tags → ``filter`` on rel →
    ``element_at(1)`` — attribute order/quoting free); root-relative
    hrefs absolutize against the page host; pages without the tag or
    self-canonical pages are omitted (they are their own key)."""
    html_s = F.decode(F.col("html"), "UTF-8")
    tags = F.regexp_extract_all(html_s, F.lit(_LINK_TAG_RE), F.lit(0))
    # try_element_at: ANSI mode makes element_at throw on an empty array
    # (pages with no canonical tag)
    first = F.try_element_at(
        F.filter(tags, lambda t: _rel_is(t, "canonical")), F.lit(1)
    )
    href = F.coalesce(F.regexp_extract(first, _HREF_RE, 1), F.lit(""))
    scheme = F.regexp_extract("url", "^([a-z][a-z0-9+.-]*)://", 1)
    canonical = (
        F.when(href.rlike("^[a-z][a-z0-9+.-]*://"), href)
        .when(
            href.startswith("/"),
            F.concat(scheme, F.lit("://"), host_of("url"), href),
        )
        .otherwise(href)
    )
    return (
        web_pages.select("url", canonical.alias("canonical"))
        .filter((F.col("canonical") != "") & (F.col("canonical") != F.col("url")))
    )


def resolve_canonical_chains(
    links: DataFrame, max_rounds: int = 6
) -> DataFrame:
    """Terminal canonical target per url via pointer jumping.

    ``rel=canonical`` declarations chain in the wild (mirror -> master ->
    preferred domain); dedup needs the *terminal* target.  Pointer
    doubling (``ptr <- ptr o ptr``) resolves chains of length <= 2^k in k
    self-joins — each round one equi-join + coalesce, no driver loop over
    rows; the only driver-side state is the boolean convergence probe.

    Cyclic declarations (invalid but present at web scale) are swept in
    one pass after the loop: a row is cycle-involved when it still
    advances (odd cycles), when it converged onto itself (even cycles —
    self-links were filtered on input, so ``ptr == url`` can only arise
    from a cycle), or when its resolved target is such a row (tails
    draining into a cycle).  Those rows return ``resolved = NULL,
    is_cycle = true`` so the dedup key falls back to the url itself;
    the same flag also catches chains longer than ``2^max_rounds``.

    Returns ``(url, resolved, is_cycle)`` for every url with an outgoing
    canonical link.
    """
    ptr = links.select("url", F.col("canonical").alias("ptr")).cache()
    for _ in range(max_rounds):
        hop = ptr.select(
            F.col("url").alias("p_url"), F.col("ptr").alias("p_ptr")
        )
        nxt = (
            ptr.join(hop, ptr["ptr"] == hop["p_url"], "left")
            .select(
                ptr["url"],
                F.coalesce(hop["p_ptr"], ptr["ptr"]).alias("ptr"),
            )
            .cache()
        )
        changed = not (
            nxt.alias("n")
            .join(ptr.alias("p"), on="url")
            .filter(F.col("n.ptr") != F.col("p.ptr"))
            .isEmpty()
        )
        ptr = nxt
        if not changed:
            break
    hop = ptr.select(
        F.col("url").alias("p_url"), F.col("ptr").alias("p_ptr")
    )
    probed = ptr.join(hop, ptr["ptr"] == hop["p_url"], "left").select(
        ptr["url"],
        "ptr",
        (
            (hop["p_ptr"].isNotNull() & (hop["p_ptr"] != ptr["ptr"]))
            | (ptr["ptr"] == ptr["url"])
        ).alias("cyc"),
    )
    cyc_urls = probed.filter(F.col("cyc")).select(
        F.col("url").alias("cyc_url")
    )
    return (
        probed.join(cyc_urls, probed["ptr"] == cyc_urls["cyc_url"], "left")
        .select(
            "url",
            F.when(
                ~F.col("cyc") & F.col("cyc_url").isNull(), F.col("ptr")
            ).alias("resolved"),
            (F.col("cyc") | F.col("cyc_url").isNotNull()).alias("is_cycle"),
        )
    )


# --------------------------------------------------------------------------
# hreflang translation clusters
# --------------------------------------------------------------------------

# BCP-47 subtags may be numeric (es-419, UN M.49 regions) — the class must
# include digits or those declarations silently drop out of the clusters
_HREFLANG_ATTR_RE = "hreflang\\s*=\\s*[\"']([a-zA-Z0-9-]+)[\"']"


def hreflang_edges(web_pages: DataFrame) -> DataFrame:
    """``(url, hreflang, alt_url)`` from ``<link rel="alternate">``
    declarations — the language-variant signal that groups translations of
    one page.  Pure codegen: all ``<link>`` tags → ``filter`` on
    rel=alternate + an hreflang attribute (any attribute order, either
    quote style) → per-tag extracts; self-declarations (``alt_url ==
    url``, the spec-required self row) are dropped; hreflang is
    lowercased (BCP-47 is case-insensitive)."""
    html_s = F.decode(F.col("html"), "UTF-8")
    tags = F.regexp_extract_all(html_s, F.lit(_LINK_TAG_RE), F.lit(0))
    alt = F.filter(
        tags,
        lambda t: _rel_is(t, "alternate") & t.rlike(_HREFLANG_ATTR_RE),
    )
    e = web_pages.select("url", F.explode(alt).alias("tag"))
    lang = F.lower(F.regexp_extract("tag", _HREFLANG_ATTR_RE, 1))
    href = F.regexp_extract("tag", _HREF_RE, 1)
    return e.select(
        "url", lang.alias("hreflang"), href.alias("alt_url")
    ).filter((F.col("alt_url") != "") & (F.col("alt_url") != F.col("url")))


def hreflang_groups(web_pages: DataFrame) -> DataFrame:
    """``(url, group_id)`` translation clusters via connected components.

    Sites declare alternates inconsistently (partial sets, one-directional
    chains); the union of declarations is an undirected graph whose
    components are the translation sets — the same large-star/small-star
    machinery (with the driver union-find short-circuit) the alias
    canonicalizer uses, group id = lexicographic-min url.
    """
    from search_spark.operators.canonicalize import connected_components

    edges = hreflang_edges(web_pages).select(
        F.col("url").alias("src"), F.col("alt_url").alias("dst")
    )
    return connected_components(edges).select(
        F.col("id").alias("url"), F.col("component").alias("group_id")
    )
