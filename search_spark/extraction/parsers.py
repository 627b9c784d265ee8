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
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_spark.extraction.html_text import (
    HTML_PROFILE,
    JATS_PROFILE,
    extract_paragraphs,
)

Parser = Callable[[bytes | str], list[tuple[str, str]]]


def _as_text(raw: bytes | str) -> str:
    return raw.decode("utf-8", errors="replace") if isinstance(raw, bytes) else raw


def parse_html(raw: bytes | str) -> list[tuple[str, str]]:
    return [(sec, text) for _, sec, text in extract_paragraphs(raw, HTML_PROFILE)]


def parse_jats_xml(raw: bytes | str) -> list[tuple[str, str]]:
    return [(sec, text) for _, sec, text in extract_paragraphs(raw, JATS_PROFILE)]


def parse_cord19_json(raw: bytes | str) -> list[tuple[str, str]]:
    doc = json.loads(_as_text(raw))
    out: list[tuple[str, str]] = []
    for para in doc.get("abstract", []):
        text = (para.get("text") or "").strip()
        if text:
            out.append(("Abstract", text))
    for para in doc.get("body_text", []):
        text = (para.get("text") or "").strip()
        if text:
            out.append((para.get("section") or "", text))
    # figure/table captions appended last (article.py:802-808)
    for ref in (doc.get("ref_entries") or {}).values():
        text = (ref.get("text") or "").strip()
        if text:
            out.append(("Caption", text))
    return out


PARSERS: dict[str, Parser] = {
    "html": parse_html,
    "jats_xml": parse_jats_xml,
    "cord19_json": parse_cord19_json,
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
