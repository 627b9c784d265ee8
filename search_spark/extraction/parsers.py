"""Multi-format article parser registry — the ``ArticleParser`` slot.

Reference analogue: the ``ArticleParser`` abstract class and its
per-format subclasses (article.py:99-255; ``CORD19ArticleParser``
716-823, ``JATSXMLParser`` 258-591, ``PubMedXMLParser`` 594-713,
``TEIXMLParser`` 826-1058), selected per source by ``iter_parsers``
(entrypoint/database/parse.py:127-157). Here a parser is a callable
``raw bytes/str → [(section, text), ...]`` registered under a format key;
:func:`extract_stage_multi` dispatches per row *inside* the Arrow batch,
so one scan handles a mixed-format corpus with no per-format job.

Paragraph conventions per parser:

* ``html`` — the boilerplate-stripped page walk (html_text.py; the
  byte-identical extraction kernel).
* ``cord19_json`` — CORD-19 article JSON: abstract paragraphs first
  (section "Abstract", matching the reference's abstract-then-body
  sentence order, add.py:140-153), then ``body_text`` paragraphs under
  their section names, then ``ref_entries`` captions as "Caption"
  paragraphs appended last (CORD19ArticleParser.paragraphs,
  article.py:794-808).
* ``jats_xml`` — scientific XML via the JATS tag profile of the same
  kernel.
* ``pubmed_xml`` — PubMed abstract-only articles
  (``PubMedXMLParser``, article.py:594-713): the ``AbstractText``
  paragraphs under section "Abstract"; body paragraphs do not exist in
  PubMed sets (the reference's ``paragraphs`` property returns ``()``).
  A ``<PubmedArticleSet>`` root is accepted and yields every member
  article's abstract (set iteration, entrypoint/database/parse.py:143-147).
* ``tei_xml`` — GROBID TEI output (``TEIXMLParser``, article.py:826-1058):
  abstract divs first, then body divs under their ``<head>`` titles with
  the reference's sentence reassembly of ``<p>``/``<formula>`` runs
  (``_build_texts``, article.py:998-1058 — formulas become the
  ``FORMULA`` placeholder, lowercase-starting fragments continue the
  previous sentence, emitted texts end with a period), then figure/table
  captions.
"""

from __future__ import annotations

import json
import string
from typing import Callable, Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_spark.extraction.html_text import (
    HTML_PROFILE,
    JATS_PROFILE,
    extract_paragraphs,
    render_element,
)

Parser = Callable[[bytes | str], list[tuple[str, str]]]


def _as_text(raw: bytes | str) -> str:
    return raw.decode("utf-8", errors="replace") if isinstance(raw, bytes) else raw


def parse_html(raw: bytes | str) -> list[tuple[str, str]]:
    return [(sec, text) for _, sec, text in extract_paragraphs(raw, HTML_PROFILE)]


def _jats_parse_section(section) -> Iterator[tuple[str, str]]:
    """Faithful port of ``JATSXMLParser.parse_section`` (article.py:484-508):
    the section title is the element's own ``<title>`` child; nested
    ``<sec>`` recurse with their own titles; ``title``/``caption``/``fig``/
    ``table-wrap`` children are skipped; every other child renders through
    the byte-parity JATS kernel."""
    sec_title = render_element(section.find("title"), JATS_PROFILE)
    for element in section:
        if element.tag == "sec":
            yield from _jats_parse_section(element)
        elif element.tag in {"title", "caption", "fig", "table-wrap"}:
            continue
        else:
            text = render_element(element, JATS_PROFILE)
            if text:
                yield sec_title, text


def parse_jats_xml(raw: bytes | str) -> list[tuple[str, str]]:
    """JATS article → (section, text) pairs, reference-faithful
    (``JATSXMLParser.paragraphs``, article.py:392-429): abstract paragraphs
    first (under "Abstract", the engine's abstract-then-body convention),
    then the body walked with scoped section titles, then figure captions,
    then table captions (``./caption/p`` falling back to
    ``./caption/title``)."""
    from xml.etree.ElementTree import fromstring

    root = fromstring(_as_text(raw))
    out: list[tuple[str, str]] = []
    abstract = root.find("./front/article-meta/abstract")
    # reference uses Element truthiness (= has children) for both guards
    if abstract:
        out.extend(
            ("Abstract", text) for _, text in _jats_parse_section(abstract)
        )
    body = root.find("./body")
    if body:
        out.extend(_jats_parse_section(body))
    for fig in root.findall("./body//fig"):
        caption = " ".join(
            render_element(c, JATS_PROFILE) for c in fig.findall("caption")
        )
        if caption:
            out.append(("Figure Caption", caption))
    for table in root.findall("./body//table-wrap"):
        caption_elements = table.findall("./caption/p") or table.findall(
            "./caption/title"
        )
        caption = " ".join(
            render_element(c, JATS_PROFILE) for c in caption_elements
        )
        if caption:
            out.append(("Table Caption", caption))
    return out


def parse_cord19_json(raw: bytes | str) -> list[tuple[str, str]]:
    """CORD-19 JSON → (section, text) pairs, reference-verbatim
    (``CORD19ArticleParser``, article.py:780-808): abstract paragraph texts
    first (under "Abstract" — the engine's abstract-then-body convention,
    add.py:140-153), then ``body_text`` under their section names, then
    every ``ref_entries`` caption under "Caption". No stripping or
    empty-filtering — the reference yields rows verbatim, and paragraph
    positions must enumerate identically."""
    doc = json.loads(_as_text(raw))
    out: list[tuple[str, str]] = []
    for para in doc.get("abstract", []):
        out.append(("Abstract", para["text"]))
    for para in doc.get("body_text", []):
        out.append((para["section"], para["text"]))
    for ref in (doc.get("ref_entries") or {}).values():
        out.append(("Caption", ref["text"]))
    return out


_TEI_NS = {"tei": "http://www.tei-c.org/ns/1.0"}


def _itertext(element: ElementTree.Element | None) -> str:
    """Reference ``TEIXMLParser._element_to_str`` semantics: plain itertext
    concatenation (no tag rules — TEI is already clean GROBID output)."""
    return "".join(element.itertext()) if element is not None else ""


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _tei_build_texts(elements: list[ElementTree.Element]) -> list[str]:
    """Sentence reassembly of ``<p>``/``<formula>`` runs
    (article.py:998-1058): a paragraph starting with an uppercase letter
    begins a new sentence; otherwise it continues the previous one;
    formulas contribute the ``FORMULA`` placeholder; every emitted text
    ends with a period."""
    out: list[str] = []
    text = ""

    def flush(t: str) -> None:
        if t:
            out.append(t if t.endswith(".") else t + ".")

    for child in elements:
        name = _localname(child.tag)
        if name == "p":
            p_text = _itertext(child).strip()
            if not p_text:
                continue
            if p_text[0] in string.ascii_uppercase:
                flush(text)
                text = p_text
            else:
                text += " " + p_text
        elif name == "formula":
            text += " FORMULA"
        else:
            raise ValueError(f"unexpected TEI tag inside div: {child.tag}")
    flush(text)
    return out


def parse_tei_xml(raw: bytes | str) -> list[tuple[str, str]]:
    root = ElementTree.fromstring(_as_text(raw))
    out: list[tuple[str, str]] = []
    for div in root.findall(
        "./tei:teiHeader/tei:profileDesc/tei:abstract/tei:div", _TEI_NS
    ):
        for text in _tei_build_texts(list(div)):
            out.append(("Abstract", text))
    for div in root.findall("./tei:text/tei:body/tei:div", _TEI_NS):
        section = _itertext(div.find("./tei:head", _TEI_NS))
        body = [c for c in div if _localname(c.tag) != "head"]
        for text in _tei_build_texts(body):
            out.append((section, text))
    for figure in root.findall("./tei:text/tei:body/tei:figure", _TEI_NS):
        caption = _itertext(figure.find("./tei:figDesc", _TEI_NS))
        if not caption:
            continue
        kind = "Table Caption" if figure.get("type") == "table" else "Figure Caption"
        out.append((kind, caption))
    return out


def parse_jats_meca(raw: bytes | str) -> list[tuple[str, str]]:
    """Zipped ``.meca`` JATS archive (``JATSXMLParser.from_zip``,
    article.py:310-341): exactly one ``content/*.xml`` member holds the
    article; it parses like plain JATS XML."""
    import io
    from zipfile import ZipFile

    data = raw if isinstance(raw, bytes) else raw.encode("utf-8")
    with ZipFile(io.BytesIO(data)) as zf:
        xml_files = [
            n
            for n in zf.namelist()
            if n.startswith("content/") and n.endswith(".xml")
        ]
        if len(xml_files) != 1:
            raise ValueError(
                "there needs to be exactly one .xml file inside content/"
            )
        return parse_jats_xml(zf.read(xml_files[0]))


def parse_pubmed_xml(raw: bytes | str) -> list[tuple[str, str]]:
    root = ElementTree.fromstring(_as_text(raw))
    articles = (
        root.iter("PubmedArticle")
        if root.tag == "PubmedArticleSet"
        else [root]
    )
    out: list[tuple[str, str]] = []
    for art in articles:
        abstract = art.find("./MedlineCitation/Article/Abstract")
        if abstract is None:
            continue
        for para in abstract.iter("AbstractText"):
            if para.text:
                out.append(("Abstract", para.text))
    return out


PARSERS: dict[str, Parser] = {
    "html": parse_html,
    "jats_xml": parse_jats_xml,
    "jats_meca": parse_jats_meca,
    "cord19_json": parse_cord19_json,
    "pubmed_xml": parse_pubmed_xml,
    "tei_xml": parse_tei_xml,
}


def register_parser(fmt: str, parser: Parser) -> None:
    """The user extension point — a new format is one registered callable."""
    PARSERS[fmt] = parser


def extract_stage_multi(
    pages: DataFrame,
    format_col: str = "source_format",
    raw_col: str = "html",
    english_only: bool = True,
) -> DataFrame:
    """Mixed-format extraction: dispatch on ``format_col`` per row.

    Output schema matches ``extract_stage``:
    ``paragraphs(url, uid, ppos, section, text)``.
    """
    from search_spark.extraction.extract import PARAGRAPHS_SCHEMA

    src = pages
    if english_only and "lang" in pages.columns:
        src = src.filter(F.col("lang") == "en")
    src = src.select("url", format_col, raw_col)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "ppos": [], "section": [], "text": []
            }
            for url, fmt, raw in zip(
                pdf["url"], pdf[format_col], pdf[raw_col]
            ):
                parser = PARSERS.get(fmt)
                if parser is None:
                    continue  # unknown format rows are skipped, not fatal
                for ppos, (section, text) in enumerate(parser(raw)):
                    rows["url"].append(url)
                    rows["ppos"].append(ppos)
                    rows["section"].append(section)
                    rows["text"].append(text)
            out = pd.DataFrame(rows)
            if len(out):
                out["ppos"] = out["ppos"].astype("int32")
            yield out

    paragraphs = src.mapInPandas(_extract, schema=PARAGRAPHS_SCHEMA)
    return paragraphs.select(
        "url", F.md5(F.col("url")).alias("uid"), "ppos", "section", "text"
    )
