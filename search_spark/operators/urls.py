"""URL canonicalization for web-page dedup keys.

Common-Crawl-style corpora key documents by ``url`` (SURVEY.md §1.3); raw
urls fragment the key space — the same page appears with tracking
parameters, fragments, ``www.`` prefixes, scheme variants and trailing
slashes. ``canonical_url_col`` collapses those, entirely in codegen
(``lower`` + ``regexp_replace`` chain, no UDF), so canonical-url dedup
stays a plain hash aggregation at any corpus size.

Normalization (applied in order, each a documented trade-off):
1. lowercase (canonical keys, at the cost of path case),
2. strip ``#fragment``,
3. drop ``utm_*`` tracking parameters — anchored to a parameter boundary
   (``?``/``&``) so a ``utm_...=`` substring inside a path segment or a
   longer parameter name (``xutm_a=b``) is never touched; the kept
   delimiter plus a separator cleanup pass handles adjacent/trailing
   tracking params,
4. strip the scheme and a leading ``www.``,
5. strip one trailing ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_url_col(url: str | Column) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    c = F.lower(c)
    c = F.regexp_replace(c, "#.*", "")
    c = F.regexp_replace(c, "([?&])utm_[a-z]+=[^&]*", "$1")
    c = F.regexp_replace(c, "&&+", "&")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, "[?&]+$", "")
    c = F.regexp_replace(c, r"^https?://(www\.)?", "")
    c = F.regexp_replace(c, "/$", "")
    return c
