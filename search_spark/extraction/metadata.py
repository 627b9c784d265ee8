"""Article-level metadata model: title / authors / abstract / identifiers.

Reference analogue: the ``Article`` dataclass fields and the per-parser
metadata properties (`/root/reference/src/bluesearch/database/article.py`):

* deterministic UID — ``md5(str((pubmed_id, pmc_id, arxiv_id, doi)))`` when
  any identifier exists, else md5 over the full content
  (``get_uid_from_identifiers`` + ``uid``, article.py:191-255);
* arXiv id from a file path (``get_arxiv_id``, article.py:52-96) — both the
  post-2007 ``YYMM.NNNN(N)vV`` stem format and the pre-2007
  ``arxiv/<archive>/<format>/YYMM/YYMMNNNvV.ext`` path format;
* author-name assembly per source format (JATS article.py:355-374, PubMed
  630-645, CORD-19 756-776, TEI 860-881) — filter-empty name parts joined
  with spaces;
* the ``articles`` table shape (entrypoint/database/schemas.py:34-50):
  uid (md5 PK), ids, title, authors, abstract, journal, is_english.

The Spark stage (:func:`articles_stage`) keeps nested values nested
(``authors``/``abstract`` as ``array<string>`` — the reference flattens to
joined strings only because MySQL can't store arrays, SURVEY.md §1.2) and
runs as one Arrow-batched ``mapInPandas`` over the raw column.
"""

from __future__ import annotations

import hashlib
import json
import re
import string
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_spark.extraction.html_text import (
    JATS_PROFILE,
    extract_paragraphs,
    render_element,
)
from search_spark.extraction.parsers import (
    _TEI_NS,
    _as_text,
    _itertext,
    _tei_build_texts,
)

# --------------------------------------------------------------------------
# identifiers / uid
# --------------------------------------------------------------------------

IDENTIFIER_FIELDS = ("pubmed_id", "pmc_id", "arxiv_id", "doi")


def uid_from_identifiers(identifiers: tuple[str | None, ...]) -> str:
    """``md5(str(identifiers))`` — byte-compatible with the reference
    (article.py:216-223): ``None`` is a value, so ``(a, None) != (a, b)``."""
    if all(x is None for x in identifiers):
        raise ValueError("all identifiers are None; UID cannot be computed")
    return hashlib.md5(str(identifiers).encode()).hexdigest()


def content_uid(
    title: str,
    authors: list[str],
    abstract: list[str],
    paragraphs: list[tuple[str, str]],
) -> str:
    """Fallback UID hashing the whole content (article.py:241-251)."""
    m = hashlib.md5()
    m.update(title.encode())
    m.update(str(list(authors)).encode())
    m.update(str(list(abstract)).encode())
    m.update(str(list(paragraphs)).encode())
    return m.hexdigest()


# arXiv identifier scheme (https://arxiv.org/help/arxiv_identifier):
# new format YYMM.NNNN or YYMM.NNNNN with version; old format
# <archive>/YYMMNNN with version, recoverable only from the full path.
_ARXIV_NEW_RE = re.compile(r"\d{4}\.\d{4}\d?v\d+")
_ARXIV_OLD_RE = re.compile(r"arxiv/([\w-]+)/\w+/\d{4}/(\d{7}v\d+)\.\w+\Z")


def arxiv_id_from_path(path: str, with_prefix: bool = True) -> str:
    """Infer the arXiv id (with version) from an article file path
    (reference ``get_arxiv_id``, article.py:52-96)."""
    prefix = "arxiv:" if with_prefix else ""
    parts = path.rstrip("/").split("/")
    stem = parts[-1].rsplit(".", 1)[0] if "." in parts[-1] else parts[-1]
    if _ARXIV_NEW_RE.fullmatch(stem):
        return f"{prefix}{stem}"
    m = _ARXIV_OLD_RE.search("/".join(parts[-5:]))
    if m:
        cat, id_ = m.groups()
        return f"{prefix}{cat}/{id_}"
    raise ValueError(f"could not extract arXiv ID from path {path!r}")


def arxiv_id_col(path_col: str | Column) -> Column:
    """JVM-side arXiv-id extraction for the common (new-format) case —
    ``regexp_extract`` over the path stem; empty string when absent."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    stem = F.regexp_extract(c, r"([^/]+?)(?:\.\w+)?$", 1)
    new = F.regexp_extract(stem, r"^(\d{4}\.\d{4}\d?v\d+)$", 1)
    return F.when(new != "", F.concat(F.lit("arxiv:"), new)).otherwise(
        F.lit(None).cast("string")
    )


# --------------------------------------------------------------------------
# per-format metadata extraction (plain-Python kernels, run inside the UDF)
# --------------------------------------------------------------------------


def _join_name_parts(parts: list[str]) -> str:
    return " ".join(p for p in parts if p).strip()


def pubmed_metadata(raw: bytes | str) -> dict:
    """PubMed article metadata (PubMedXMLParser, article.py:594-713)."""
    root = ElementTree.fromstring(_as_text(raw))
    if root.tag == "PubmedArticleSet":
        root = next(iter(root.iter("PubmedArticle")))
    art = root.find("./MedlineCitation/Article")
    title_el = art.find("ArticleTitle") if art is not None else None
    authors: list[str] = []
    author_list = art.find("AuthorList") if art is not None else None
    if author_list is not None:
        for author in author_list:
            if author.get("ValidYN") == "Y":
                fore = author.find("ForeName")
                last = author.find("LastName")
                name = _join_name_parts(
                    [x.text for x in (fore, last) if x is not None]
                )
                if name:
                    authors.append(name)
    abstract = [
        p.text
        for p in (
            art.find("Abstract").iter("AbstractText")
            if art is not None and art.find("Abstract") is not None
            else []
        )
        if p.text
    ]
    pmid = root.find("./MedlineCitation/PMID")
    pmc = root.find("./PubmedData/ArticleIdList/ArticleId[@IdType='pmc']")
    doi = root.find("./PubmedData/ArticleIdList/ArticleId[@IdType='doi']")
    journal = (
        art.find("Journal/Title") if art is not None else None
    )
    return {
        "title": title_el.text if title_el is not None else "",
        "authors": authors,
        "abstract": abstract,
        "pubmed_id": pmid.text if pmid is not None else None,
        "pmc_id": pmc.text if pmc is not None else None,
        "arxiv_id": None,
        "doi": doi.text if doi is not None else None,
        "journal": journal.text if journal is not None else None,
    }


def jats_metadata(raw: bytes | str) -> dict:
    """JATS article metadata (JATSXMLParser, article.py:342-482)."""
    root = ElementTree.fromstring(_as_text(raw))
    title = render_element(
        root.find("./front/article-meta/title-group/article-title"),
        JATS_PROFILE,
    )
    authors = []
    for author in root.findall(
        "./front/article-meta/contrib-group/contrib[@contrib-type='author']"
    ):
        given = render_element(author.find("name/given-names"), JATS_PROFILE)
        surname = render_element(author.find("name/surname"), JATS_PROFILE)
        if given and surname:  # organizations etc. are skipped
            authors.append(f"{given} {surname}".strip())
    abstract_el = root.find("./front/article-meta/abstract")
    abstract = []
    if abstract_el is not None:
        abstract = [
            text
            for _, _, text in extract_paragraphs(
                ElementTree.tostring(abstract_el, encoding="unicode"),
                JATS_PROFILE,
            )
        ]
    ids: dict[str, str] = {}
    for aid in root.findall("./front/article-meta/article-id"):
        if "pub-id-type" in aid.attrib and aid.text:
            ids[aid.attrib["pub-id-type"]] = aid.text
    journal = root.find("./front/journal-meta//journal-title")
    return {
        "title": title,
        "authors": authors,
        "abstract": abstract,
        "pubmed_id": ids.get("pmid"),
        "pmc_id": ids.get("pmc"),
        "arxiv_id": None,
        "doi": ids.get("doi"),
        "journal": journal.text if journal is not None else None,
    }


def tei_metadata(raw: bytes | str, path: str | None = None) -> dict:
    """TEI/GROBID metadata (TEIXMLParser, article.py:826-981); when ``path``
    looks like an arXiv file path, the arXiv id is inferred from it."""
    root = ElementTree.fromstring(_as_text(raw))
    title = _itertext(
        root.find("./tei:teiHeader/tei:fileDesc/tei:titleStmt/", _TEI_NS)
    )
    authors = []
    for pers in root.findall(
        "./tei:teiHeader/tei:fileDesc/tei:sourceDesc/tei:biblStruct"
        "/tei:analytic/tei:author/tei:persName",
        _TEI_NS,
    ):
        parts = [
            _itertext(pers.find("./tei:forename[@type='first']", _TEI_NS)),
            _itertext(pers.find("./tei:forename[@type='middle']", _TEI_NS)),
            _itertext(pers.find("./tei:surname", _TEI_NS)),
        ]
        name = _join_name_parts(parts)
        if name:
            authors.append(name)
    abstract = []
    for div in root.findall(
        "./tei:teiHeader/tei:profileDesc/tei:abstract/tei:div", _TEI_NS
    ):
        abstract.extend(_tei_build_texts(list(div)))
    ids = {
        idno.get("type"): idno.text
        for idno in root.findall(
            "./tei:teiHeader/tei:fileDesc/tei:sourceDesc"
            "/tei:biblStruct/tei:idno",
            _TEI_NS,
        )
    }
    arxiv_id = None
    if path:
        try:
            arxiv_id = arxiv_id_from_path(path)
        except ValueError:
            arxiv_id = None
    return {
        "title": title,
        "authors": authors,
        "abstract": abstract,
        "pubmed_id": None,
        "pmc_id": None,
        "arxiv_id": arxiv_id,
        "doi": ids.get("DOI"),
        "journal": None,
    }


def cord19_metadata(raw: bytes | str) -> dict:
    """CORD-19 JSON metadata (CORD19ArticleParser, article.py:716-823):
    author parts ``(first, " ".join(middle), last, suffix)`` filter-empty."""
    doc = json.loads(_as_text(raw))
    meta = doc.get("metadata", {})
    authors = []
    for a in meta.get("authors", []):
        name = _join_name_parts(
            [
                a.get("first") or "",
                " ".join(a.get("middle", [])),
                a.get("last") or "",
                a.get("suffix") or "",
            ]
        )
        if name:
            authors.append(name)
    return {
        "title": meta.get("title", ""),
        "authors": authors,
        "abstract": [p["text"] for p in doc.get("abstract", [])],
        "pubmed_id": None,
        # the reference keys CORD-19 articles by paper_id via the pmc_id
        # slot (article.py:811-819)
        "pmc_id": doc.get("paper_id"),
        "arxiv_id": None,
        "doi": None,
        "journal": None,
    }


def html_metadata(raw: bytes | str) -> dict:
    """Web pages: ``<title>`` as the title; no structured authors/ids."""
    text = _as_text(raw)
    m = re.search(r"<title[^>]*>(.*?)</title>", text, re.S | re.I)
    return {
        "title": (m.group(1).strip() if m else ""),
        "authors": [],
        "abstract": [],
        "pubmed_id": None,
        "pmc_id": None,
        "arxiv_id": None,
        "doi": None,
        "journal": None,
    }


METADATA_PARSERS = {
    "html": html_metadata,
    "jats_xml": jats_metadata,
    "cord19_json": cord19_metadata,
    "pubmed_xml": pubmed_metadata,
    "tei_xml": tei_metadata,
}


def article_uid(meta: dict, url: str | None = None) -> str:
    """The reference's uid cascade (article.py:226-255): hash identifiers if
    any exist, else hash content; web pages key on ``md5(url)``."""
    ids = tuple(meta.get(f) for f in IDENTIFIER_FIELDS)
    if any(x is not None for x in ids):
        return uid_from_identifiers(ids)
    if url is not None:
        return hashlib.md5(url.encode()).hexdigest()
    return content_uid(
        meta.get("title", ""), meta.get("authors", []),
        meta.get("abstract", []), [],
    )


# --------------------------------------------------------------------------
# Spark stage
# --------------------------------------------------------------------------

ARTICLES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("uid", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("authors", T.ArrayType(T.StringType()), False),
        T.StructField("abstract", T.ArrayType(T.StringType()), False),
        T.StructField("pubmed_id", T.StringType(), True),
        T.StructField("pmc_id", T.StringType(), True),
        T.StructField("arxiv_id", T.StringType(), True),
        T.StructField("doi", T.StringType(), True),
        T.StructField("journal", T.StringType(), True),
        T.StructField("is_english", T.BooleanType(), False),
    ]
)


def articles_stage(
    pages: DataFrame,
    format_col: str = "source_format",
    raw_col: str = "html",
) -> DataFrame:
    """Build the ``articles`` metadata table from a (mixed-format) corpus.

    One Arrow-batched pass; rows whose format has no registered metadata
    parser fall back to empty metadata with ``uid = md5(url)`` (the web-page
    identity contract, SURVEY.md §1.3). ``is_english`` comes from the
    ``lang`` column when present (input_hint), else defaults true.
    """
    has_lang = "lang" in pages.columns
    has_fmt = format_col in pages.columns
    cols = ["url", raw_col] + (["lang"] if has_lang else []) + (
        [format_col] if has_fmt else []
    )
    src = pages.select(*cols)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                fmt = r[format_col] if has_fmt else "html"
                parser = METADATA_PARSERS.get(fmt, html_metadata)
                try:
                    meta = parser(r[raw_col])
                except Exception:  # malformed row — total function, no abort
                    meta = {
                        "title": "", "authors": [], "abstract": [],
                        "pubmed_id": None, "pmc_id": None, "arxiv_id": None,
                        "doi": None, "journal": None,
                    }
                rows.append(
                    {
                        "url": r["url"],
                        "uid": article_uid(meta, url=r["url"]),
                        "title": meta["title"],
                        "authors": meta["authors"],
                        "abstract": meta["abstract"],
                        "pubmed_id": meta["pubmed_id"],
                        "pmc_id": meta["pmc_id"],
                        "arxiv_id": meta["arxiv_id"],
                        "doi": meta["doi"],
                        "journal": meta["journal"],
                        "is_english": (r["lang"] == "en") if has_lang else True,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ARTICLES_SCHEMA.fields]
            )

    return src.mapInPandas(_extract, schema=ARTICLES_SCHEMA)
