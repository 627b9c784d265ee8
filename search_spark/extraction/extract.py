"""Stage 1 — extract: ``web_pages`` → ``paragraphs``.

Reference analogue: the parse stage of the ``bbs_database run`` DAG
(entrypoint/database/parse.py + ArticleParser subclasses, article.py) which
turns raw documents into (section, paragraph-text) pairs. Here it is one
Arrow-batched ``mapInPandas`` over the ``html`` column — the per-url contract
is *byte-identical* extracted text vs. the reference kernel (BASELINE.md).

Output schema:
    paragraphs(url string, uid string, ppos int, section string, text string)

``uid = md5(url)`` preserves the reference's deterministic-UID contract
(article.py:216-223 hashes the identifier tuple; for web pages the identifier
is the url — SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_spark.extraction.html_text import (
    HTML_PROFILE,
    TagProfile,
    extract_paragraphs,
)

PARAGRAPHS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("ppos", T.IntegerType(), False),
        T.StructField("section", T.StringType(), True),
        T.StructField("text", T.StringType(), False),
    ]
)


def extract_stage(
    web_pages: DataFrame,
    profile: TagProfile = HTML_PROFILE,
    english_only: bool = True,
) -> DataFrame:
    """Run boilerplate-stripping extraction over a web_pages DataFrame.

    The language filter runs *before* the UDF so Catalyst pushes it into the
    scan and the expensive parse never sees filtered rows (reference
    analogue: ``is_english`` predicate, database/cord_19.py:460-487 — here
    the input already carries ``lang`` per the input_hint).
    """
    src = web_pages
    if english_only:
        src = src.filter(F.col("lang") == "en")
    # Column pruning before the UDF: only (url, html) cross the Arrow
    # boundary; Catalyst prunes the parquet/Iceberg scan accordingly.
    src = src.select("url", "html")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_url: list[str] = []
            out_ppos: list[int] = []
            out_sec: list[str] = []
            out_text: list[str] = []
            for url, html_doc in zip(pdf["url"], pdf["html"]):
                for ppos, section, text in extract_paragraphs(html_doc, profile):
                    out_url.append(url)
                    out_ppos.append(ppos)
                    out_sec.append(section)
                    out_text.append(text)
            yield pd.DataFrame(
                {
                    "url": out_url,
                    "ppos": pd.array(out_ppos, dtype="int32"),
                    "section": out_sec,
                    "text": out_text,
                }
            )

    paragraphs = src.mapInPandas(_extract, schema=PARAGRAPHS_SCHEMA)
    # uid is a cheap JVM-side expression — no reason to pay for it in Python.
    return paragraphs.select(
        "url",
        F.md5(F.col("url")).alias("uid"),
        "ppos",
        "section",
        "text",
    )
