"""Boilerplate-stripping text extraction kernel.

This is the engine's equivalent of the reference's inner-text extraction
(`/root/reference/src/bluesearch/database/article.py:510-591`,
``JATSXMLParser._inner_text`` / ``_element_to_str``). The contract — verified
byte-for-byte against the reference in ``tests/test_extraction_parity.py`` —
is:

  * the text of an element is the concatenation of its own text and, for each
    child, the rendered child followed by the child's tail;
  * raw text fragments are HTML-unescaped (``&amp;`` → ``&``);
  * every rendered element is ``unicodedata.normalize("NFKC", ...)``-ed and
    ``.strip()``-ed (at *every* nesting level, not just the top);
  * ``<sub>x</sub>`` renders as ``_x``, ``<sup>x</sup>`` as ``^x``;
  * a configurable set of tags (formulas, links, emails, URIs) renders as the
    empty string — their content is dropped entirely.

The tag vocabulary is a :class:`TagProfile`: ``JATS_PROFILE`` reproduces the
reference's scientific-XML rules exactly, ``HTML_PROFILE`` maps the same
rules onto Common-Crawl-style HTML (``<a>`` plays the role of ``ext-link``;
``nav``/``footer``/``script`` etc. are boilerplate containers skipped during
the page walk).

Everything here is pure Python over ``xml.etree`` — it runs *inside* an
Arrow-batched pandas UDF (see ``extract.py``), never per-row from the driver.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata
from dataclasses import dataclass, field
from typing import Iterator
from xml.etree import ElementTree


@dataclass(frozen=True)
class TagProfile:
    """Tag vocabulary for the extraction kernel."""

    subscript: frozenset[str]
    superscript: frozenset[str]
    dropped: frozenset[str]
    # page-walk structure (only used by extract_paragraphs)
    paragraph_tags: frozenset[str] = frozenset({"p"})
    heading_tags: frozenset[str] = frozenset()
    skip_containers: frozenset[str] = frozenset()


# Mirrors article.py:562-588 (styling tags need no special casing: the
# default handling is already "render inner text").
JATS_PROFILE = TagProfile(
    subscript=frozenset({"sub"}),
    superscript=frozenset({"sup"}),
    dropped=frozenset(
        {"disp-formula", "email", "ext-link", "inline-formula", "uri"}
    ),
    paragraph_tags=frozenset({"p"}),
    heading_tags=frozenset({"title"}),
    skip_containers=frozenset({"caption", "fig", "table-wrap"}),
)

# Common-Crawl-style HTML: same inner-text semantics, web tag names.
HTML_PROFILE = TagProfile(
    subscript=frozenset({"sub"}),
    superscript=frozenset({"sup"}),
    dropped=frozenset(
        {
            "a",  # link text dropped, like the reference's ext-link/uri
            "script",
            "style",
            "noscript",
            "iframe",
            "svg",
            "math",
            "form",
            "button",
            "input",
            "select",
            "textarea",
            "object",
            "embed",
            "audio",
            "video",
            "canvas",
        }
    ),
    paragraph_tags=frozenset({"p", "li", "blockquote", "pre"}),
    heading_tags=frozenset({"h1", "h2", "h3", "h4", "h5", "h6"}),
    skip_containers=frozenset(
        {"nav", "footer", "header", "aside", "head", "figure", "table"}
    ),
)


def _unescape(raw: str | None) -> str:
    return _html.unescape(raw) if raw else ""


def render_element(
    element: ElementTree.Element | None, profile: TagProfile = HTML_PROFILE
) -> str:
    """Render one element (and its subtree) to clean text.

    Byte-identical to the reference's ``_element_to_str``
    (article.py:546-591) when called with ``JATS_PROFILE``.
    """
    if element is None:
        return ""
    tag = element.tag
    if tag in profile.dropped:
        return ""
    inner = _inner_text(element, profile)
    if tag in profile.subscript:
        return f"_{inner}"
    if tag in profile.superscript:
        return f"^{inner}"
    return inner


def _inner_text(element: ElementTree.Element, profile: TagProfile) -> str:
    # Concatenate own text, rendered children and their tails; unescape raw
    # fragments; NFKC-normalize and strip the whole (article.py:538-544).
    parts = [_unescape(element.text)]
    for child in element:
        parts.append(render_element(child, profile))
        parts.append(_unescape(child.tail))
    return unicodedata.normalize("NFKC", "".join(parts)).strip()


_TAG_STRIP_RE = re.compile(r"<[^>]+>")


def extract_paragraphs(
    html_doc: bytes | str, profile: TagProfile = HTML_PROFILE
) -> list[tuple[int, str, str]]:
    """Extract ``(ppos, section, text)`` paragraphs from one web page.

    The page walk mirrors the reference's ``parse_section``
    (article.py:484-508): headings set the current section title, paragraph
    tags emit one row each, boilerplate containers are skipped entirely, and
    other containers are recursed into. Empty renders are not emitted.

    Malformed pages that ``xml.etree`` cannot parse fall back to a
    tag-stripping regex over the whole body (one paragraph, section "") —
    lossy but total, so a 10^12-page scan never aborts on one bad row.
    """
    if isinstance(html_doc, bytes):
        html_doc = html_doc.decode("utf-8", errors="replace")
    try:
        root = ElementTree.fromstring(html_doc)
    except ElementTree.ParseError:
        text = unicodedata.normalize(
            "NFKC", _html.unescape(_TAG_STRIP_RE.sub(" ", html_doc))
        )
        text = re.sub(r"\s+", " ", text).strip()
        return [(0, "", text)] if text else []

    out: list[tuple[int, str, str]] = []
    ppos = 0
    for section, text in _walk(root, "", profile):
        out.append((ppos, section, text))
        ppos += 1
    return out


def _walk(
    element: ElementTree.Element, section: str, profile: TagProfile
) -> Iterator[tuple[str, str]]:
    for child in element:
        tag = child.tag
        if tag in profile.skip_containers or tag in profile.dropped:
            continue
        if tag in profile.heading_tags:
            section = render_element(child, profile)
        elif tag in profile.paragraph_tags:
            text = render_element(child, profile)
            if text:
                yield section, text
        else:
            yield from _walk(child, section, profile)
