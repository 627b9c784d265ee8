"""``<meta>`` tag extraction — page-level metadata triples.

Open Graph (``property="og:*"``), Twitter cards and classic
``name="description|keywords|author"`` tags are the third structured-data
channel on web pages beside JSON-LD and microdata, and the cheapest: the
subject is the page itself, so every page with a ``<meta>`` head yields
``(url, property, content)`` triples with no entity resolution at all.
The reference has no equivalent (curated article inputs carry their
metadata in the article XML, which extraction/metadata.py already ports).

Pure codegen: one ``regexp_extract_all`` over the decoded page pulls each
meta tag, ``explode`` emits tag rows, attribute regexes resolve the
predicate (``property=`` wins over ``name=`` — OG pages often carry both)
and the ``content=`` object. Tags with an empty predicate or content drop.
No shuffle — the scan stage carries everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_TAG_RE = r"(<meta\b[^>]*>)"


def _attr(col, name: str):
    return F.regexp_extract(
        col, r"\b" + name + r"""\s*=\s*["']([^"']*)["']""", 1
    )


def meta_triples(web_pages: DataFrame) -> DataFrame:
    """``(subj, pred, obj, prov)`` — one row per meta tag carrying a
    ``property``/``name`` and a non-empty ``content``; subject and
    provenance are the page url."""
    html_s = F.decode(F.col("html"), "UTF-8")
    tags = web_pages.select(
        "url",
        F.explode(
            F.regexp_extract_all(html_s, F.lit(_META_TAG_RE), F.lit(1))
        ).alias("tag"),
    )
    return tags.select(
        F.col("url").alias("subj"),
        F.coalesce(
            F.nullif(_attr(F.col("tag"), "property"), F.lit("")),
            F.nullif(_attr(F.col("tag"), "name"), F.lit("")),
        ).alias("pred"),
        F.nullif(_attr(F.col("tag"), "content"), F.lit("")).alias("obj"),
        F.col("url").alias("prov"),
    ).filter(F.col("pred").isNotNull() & F.col("obj").isNotNull())
