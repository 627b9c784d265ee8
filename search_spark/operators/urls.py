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


def registered_domain_col(url: str | Column) -> Column:
    """Registered domain of a url — the per-site aggregation key.

    Host = everything between the scheme (optional) and the first ``/``,
    ``?``, ``#``, or ``:port``; the registered domain approximates the
    public-suffix rule with the host's last two labels (``a.b.example.org``
    → ``example.org``), which is exact for generic TLDs — a full
    public-suffix list is a broadcast dim-table join, out of scope here.
    Pure codegen (``lower`` + two ``regexp_extract``), so per-domain
    rollups stay one hash aggregation at any corpus size.
    """
    c = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(
        F.lower(c), r"^(?:[a-z][a-z0-9+.-]*://)?([^/?#:]+)", 1
    )
    two_label = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    # single-label hosts (localhost, bare names) pass through unchanged
    return F.when(two_label == "", host).otherwise(two_label)
