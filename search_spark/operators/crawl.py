"""Crawl-scheduling operators over raw web-page bytes — zero-UDF.

A Common-Crawl-style KG constructor sits downstream of a crawler; these two
operators close the loop on the ingest side of the corpus the reference
pipeline takes as given (its Luigi `DownloadTask`, SURVEY.md §7.4, is
out-of-scope network I/O — the *scheduling* relations it consumes are not):

* :func:`sitemap_frontier` — parse ``<urlset>`` sitemap XML documents into
  ``(loc, lastmod, priority)`` rows and anti-join the already-crawled set,
  keeping not-yet-fetched urls plus urls whose sitemap ``lastmod`` is newer
  than the stored capture (recrawl). The output is the crawl frontier,
  ordered by sitemap priority.
* :func:`robots_allowed` — evaluate ``Disallow:`` prefix rules from per-host
  ``robots.txt`` bodies against a candidate url set (longest-match wins,
  ``Allow:`` overrides on ties, empty ``Disallow:`` means allow-all), the
  standard original robots-exclusion semantics.

Both are pure JVM expression chains (``regexp_extract_all`` + ``explode`` +
joins): at 10^12 pages the cost is the scan. The robots join is
host-grained — rules aggregate to one array row per host, so the
rules⋈urls join broadcasts (hosts ≪ urls) and prefix evaluation runs as a
codegen ``F.exists`` over the per-host rule array. Skew note: a single hot
host (many candidate urls) is harmless — the broadcast join has no shuffle
on the url side and rule arrays are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_spark.joins import maybe_broadcast
from search_spark.operators.boilerplate import host_of

# one full <url>...</url> record per array element; (?s) because real
# sitemaps pretty-print records across lines and `.` stops at \n otherwise
_URL_REC_RE = "(?s)<url>.*?</url>"


def sitemap_entries(sitemaps: DataFrame) -> DataFrame:
    """``(site_host, loc, lastmod, priority)`` rows from sitemap XML bytes.

    ``sitemaps`` needs ``(url:string, html:binary)`` — the input-table shape
    (BASELINE.json input_hint); sitemap bodies ride the same binary column
    as page html. Missing ``<priority>`` defaults to 0.5 per the sitemap
    protocol; missing ``<lastmod>`` stays NULL (never triggers recrawl).
    """
    xml = F.decode(F.col("html"), "UTF-8")
    recs = F.regexp_extract_all(xml, F.lit(_URL_REC_RE), F.lit(0))
    e = sitemaps.select(
        host_of("url").alias("site_host"), F.explode(recs).alias("rec")
    )
    loc = F.regexp_extract("rec", "<loc>([^<]*)</loc>", 1)
    lastmod = F.regexp_extract("rec", "<lastmod>([^<]*)</lastmod>", 1)
    prio = F.regexp_extract("rec", "<priority>([^<]*)</priority>", 1)
    # try_* variants: a malformed lastmod/priority in one crawled sitemap
    # must degrade that field (NULL lastmod = never stale; default
    # priority), never abort the scan (ANSI mode would throw on cast)
    return e.select(
        "site_host",
        loc.alias("loc"),
        F.when(lastmod != "", F.try_to_timestamp(lastmod)).alias("lastmod"),
        F.coalesce(
            F.when(prio != "", prio.try_cast("double")), F.lit(0.5)
        ).alias("priority"),
    ).filter(loc != "")


def sitemap_frontier(sitemaps: DataFrame, crawled: DataFrame) -> DataFrame:
    """Crawl frontier: sitemap urls not yet crawled, or stale.

    ``crawled`` needs ``(url:string, warc_ts:timestamp)`` — the capture
    table. A url is frontier if it has no capture at all, or its newest
    capture predates the sitemap ``lastmod`` (stale → recrawl). Returns
    ``(loc, priority, reason)`` with reason ∈ {'new', 'stale'}.

    Plan shape: entries left-join the *per-url max capture* (a hash
    aggregate over the crawled table — map-side partial, no skew risk) —
    one shuffle each side on the url key; at 10^12 captures the aggregate
    is the dominant cost and is the minimum any staleness check pays.
    """
    entries = sitemap_entries(sitemaps)
    latest = crawled.groupBy(F.col("url").alias("loc")).agg(
        F.max("warc_ts").alias("last_fetch")
    )
    j = entries.join(latest, "loc", "left")
    reason = (
        F.when(F.col("last_fetch").isNull(), F.lit("new"))
        .when(
            F.col("lastmod").isNotNull()
            & (F.col("lastmod") > F.col("last_fetch")),
            F.lit("stale"),
        )
    )
    return (
        j.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .select("loc", "priority", "reason")
    )


def robots_rules(robots: DataFrame) -> DataFrame:
    """``(site_host, rules:array<struct<allow:boolean, prefix:string>>)``
    from robots.txt bodies, one row per host.

    ``robots`` needs ``(url:string, html:binary)`` with the robots.txt body
    in the binary column. Only ``Allow:`` / ``Disallow:`` path-prefix lines
    in groups whose ``User-agent`` header includes ``*`` are evaluated (no
    wildcards), which covers the original robots-exclusion standard; an
    empty ``Disallow:`` line is a no-op (allow-all), per the spec. A group
    is a run of consecutive ``User-agent:`` lines plus the rule lines that
    follow it; rules before any ``User-agent`` line belong to no group and
    are ignored, rules in agent-specific groups (e.g. a ``Googlebot``-only
    block) don't apply to us.
    """
    body = F.decode(F.col("html"), "UTF-8")
    lines = F.split(body, "\n")
    r = robots.select(
        host_of("url").alias("site_host"),
        F.posexplode(lines).alias("pos", "line"),
    )
    is_ua = F.regexp_extract(F.lower("line"), r"^\s*user-agent\s*:", 0) != ""
    kind = F.regexp_extract(F.lower("line"), r"^\s*(allow|disallow)\s*:", 1)
    prefix = F.trim(F.regexp_extract("line", r"^\s*[A-Za-z-]+\s*:\s*(\S*)", 1))
    marked = r.select(
        "site_host",
        "pos",
        is_ua.alias("is_ua"),
        kind.alias("kind"),
        prefix.alias("prefix"),
    )
    # group id = running count of group *openers* (a User-agent line whose
    # predecessor is not one); per-host window — robots bodies are tiny
    # and already host-grouped, so this is one shuffle on the host key
    w = Window.partitionBy("site_host").orderBy("pos")
    opener = F.col("is_ua") & ~F.coalesce(
        F.lag("is_ua").over(w), F.lit(False)
    )
    grouped = marked.withColumn(
        "gid", F.sum(opener.cast("int")).over(w)
    )
    wg = Window.partitionBy("site_host", "gid")
    star = F.max(
        (F.col("is_ua") & (F.col("prefix") == "*")).cast("int")
    ).over(wg)
    parsed = (
        grouped.withColumn("for_us", star == 1)
        .filter(
            F.col("for_us")
            & (F.col("gid") > 0)
            & (F.col("kind") != "")
            & (F.col("prefix") != "")
        )
        .select("site_host", "kind", "prefix")
    )
    return parsed.groupBy("site_host").agg(
        F.collect_list(
            F.struct(
                (F.col("kind") == "allow").alias("allow"),
                F.col("prefix").alias("prefix"),
            )
        ).alias("rules")
    )


def robots_allowed(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter candidate urls to those the host's robots.txt permits.

    ``candidates`` needs a ``url`` column. Longest-prefix-match decides; a
    tie between Allow and Disallow at equal length resolves to Allow (the
    standard tie-break). Hosts with no robots.txt row are fully allowed.
    Returns the candidate rows that survive, plus a ``matched_prefix``
    column (NULL when no rule matched).

    The rules side is one row per host → broadcast join; the longest-match
    scan is a codegen ``aggregate`` over the (tiny) per-host rule array —
    no Python, no shuffle on the candidate side.
    """
    rules = robots_rules(robots)
    # one row per host: count is cheap and gates the hint (same pattern as
    # the flagship's canonical-mapping join — broadcast only when it fits)
    rules = maybe_broadcast(rules, rules.count())
    path = F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1)
    c = candidates.withColumn("_host", host_of("url")).withColumn(
        "_path", F.when(path != "", path).otherwise(F.lit("/"))
    )
    j = c.join(rules, c._host == rules.site_host, "left")
    # longest matching rule; (length, allow) struct-max makes Allow win ties
    no_rules = F.expr(
        "CAST(array() AS array<struct<allow:boolean, prefix:string>>)"
    )
    best = F.aggregate(
        F.filter(
            F.coalesce(F.col("rules"), no_rules),
            lambda x: F.col("_path").startswith(x["prefix"]),
        ),
        F.lit(None).cast("struct<n:int, allow:boolean, prefix:string>"),
        lambda acc, x: F.when(
            acc.isNull()
            | (F.length(x["prefix"]) > acc["n"])
            | (
                (F.length(x["prefix"]) == acc["n"])
                & x["allow"]
                & ~acc["allow"]
            ),
            F.struct(
                F.length(x["prefix"]).alias("n"),
                x["allow"].alias("allow"),
                x["prefix"].alias("prefix"),
            ),
        ).otherwise(acc),
    )
    out = j.withColumn("_best", best)
    return (
        out.filter(
            F.col("_best").isNull() | F.col("_best")["allow"]
        )
        .withColumn("matched_prefix", F.col("_best")["prefix"])
        .drop("_host", "_path", "_best", "site_host", "rules")
    )


def politeness_schedule(
    frontier: DataFrame,
    crawl_delay_s: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """Assign per-host fetch slots to a crawl frontier.

    Politeness is inherently per-host serial: within one host, fetches are
    spaced ``crawl_delay_s`` apart in priority order (ties break on url).
    Returns ``(loc, host, slot, fetch_offset_s)`` — ``slot`` is the 0-based
    per-host position, ``fetch_offset_s`` its start offset; a scheduler
    drains all hosts concurrently. ``max_per_host`` caps a mega-host's
    share of the wave (the standard frontier-politeness budget).

    One shuffle on the host key; the per-host window is the semantics, not
    an accident — a host's slots must serialize. The cap bounds hot-host
    task size when set; uncapped, a host's frontier rows sort within one
    task (bounded in practice by per-wave frontier slicing upstream).
    """
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("loc")
    )
    out = (
        frontier.withColumn("host", host_of("loc"))
        .withColumn("slot", F.row_number().over(w) - 1)
        .select(
            "loc",
            "host",
            "slot",
            (F.col("slot") * F.lit(float(crawl_delay_s))).alias(
                "fetch_offset_s"
            ),
        )
    )
    if max_per_host is not None:
        out = out.filter(F.col("slot") < max_per_host)
    return out
