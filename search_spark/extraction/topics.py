"""Topic-list extraction from article XML — local files only, no HTTP.

Reference analogues (same XPaths and traversal because the PubMed / JATS
schemas dictate them; restructured as pure functions over strings/bytes):

  * ``_parse_mesh_from_pubmed``            (database/topic.py:215-260)
  * ``extract_article_topics_for_pubmed_article`` (topic.py:464-487)
  * ``extract_journal_topics_for_pubmed_article`` (topic.py:489-517) — the
    reference resolves ``MedlineTA`` through an HTTP request to the NLM
    catalog (``request_mesh_from_nlm_ta``); here that lookup is an
    **injected local catalog table** (``medline_ta`` → journal MeSH
    descriptor names). That is also the scale-correct shape: a broadcast
    dim-table join instead of a per-article network call.
  * ``extract_article_topics_from_medrxiv_article`` (topic.py:397-461) —
    over in-memory ``.meca`` zip bytes instead of a filesystem path.

Spark surface: :func:`pubmed_topics_stage` — one Arrow pass per batch
emitting ``(article_topics array<string>, medline_ta)`` per row; journal
topics attach via :func:`attach_journal_topics` (broadcast join against the
catalog DataFrame). The resulting array columns feed the topic-rule
operator (``operators/topics.py``) directly.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator
from xml.etree import ElementTree
from xml.etree.ElementTree import Element

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_mesh_from_pubmed(mesh_headings) -> list[dict]:
    """Medical Subject Headings from an efetch-style PubMed parse.

    Port of ``_parse_mesh_from_pubmed`` (topic.py:215-260): one dict per
    ``<MeshHeading>`` with ``descriptor`` / ``qualifiers`` lists of
    ``{"ID", "major_topic", "name"}`` entries.
    """
    meshs = []
    for mesh_heading in mesh_headings:
        for mesh in list(mesh_heading):
            descriptor_name: list[dict] = []
            qualifiers_name: list[dict] = []
            for info in list(mesh):
                attributes = info.attrib
                mesh_id = attributes.get("UI", None)
                if mesh_id is not None:
                    *_, mesh_id = mesh_id.rpartition("/")
                major_topic = None
                if "MajorTopicYN" in attributes:
                    major_topic = attributes["MajorTopicYN"] == "Y"
                entry = {
                    "ID": mesh_id,
                    "major_topic": major_topic,
                    "name": info.text,
                }
                if info.tag == "DescriptorName":
                    descriptor_name.append(entry)
                else:
                    qualifiers_name.append(entry)
            meshs.append(
                {"descriptor": descriptor_name, "qualifiers": qualifiers_name}
            )
    return meshs


def extract_article_topics_for_pubmed_article(
    xml_article: Element,
) -> list[str]:
    """Article topics (MeSH descriptor names) of one ``<PubmedArticle>``
    parse — port of topic.py:464-487."""
    mesh_headings = xml_article.findall("./MedlineCitation/MeshHeadingList")
    article_meshes = parse_mesh_from_pubmed(mesh_headings)
    return [
        desc["name"]
        for mesh in article_meshes
        for desc in mesh["descriptor"]
    ]


def extract_medline_ta(xml_article: Element) -> str | None:
    """The journal's ``MedlineTA`` — the key the reference sends to the NLM
    catalog (topic.py:504-507); here it keys the local catalog join."""
    medline_ta = xml_article.find(
        "./MedlineCitation/MedlineJournalInfo/MedlineTA"
    )
    if medline_ta is None or medline_ta.text is None:
        return None
    return medline_ta.text


def pubmed_article_topics(xml_source: str | bytes) -> tuple[list[str], str | None]:
    """Parse one PubMed article XML string/bytes → (article_topics,
    medline_ta)."""
    if isinstance(xml_source, bytes):
        xml_source = xml_source.decode("utf-8")
    root = ElementTree.fromstring(xml_source)
    return (
        extract_article_topics_for_pubmed_article(root),
        extract_medline_ta(root),
    )


def extract_article_topics_from_medrxiv_meca(data: bytes) -> tuple[str, str]:
    """Topic + journal of a medRxiv/bioRxiv ``.meca`` archive (zip bytes) —
    port of topic.py:397-461 over in-memory bytes.

    Raises ``ValueError`` exactly where the reference does: not exactly one
    ``content/*.xml`` member, missing topic, missing journal.
    """
    with zipfile.ZipFile(io.BytesIO(data)) as myzip:
        xml_files = [
            x
            for x in myzip.namelist()
            if x.startswith("content/") and x.endswith(".xml")
        ]
        if len(xml_files) != 1:
            raise ValueError(
                "There needs to be exactly one .xml file inside of content/"
            )
        with myzip.open(xml_files[0], "r") as f:
            content = ElementTree.parse(f)
            journal_element = content.find(
                "./front/journal-meta/journal-title-group/journal-title"
            )
            topic_element = content.find(
                "./front/article-meta/article-categories/"
                "subj-group[@subj-group-type='hwp-journal-coll']/subject"
            )
            if topic_element is None:
                raise ValueError("No topic found")
            if journal_element is None:
                raise ValueError("No journal found")
            return topic_element.text, journal_element.text


_TOPICS_SCHEMA_FIELDS = [
    T.StructField("article_topics", T.ArrayType(T.StringType()), False),
    T.StructField("medline_ta", T.StringType(), True),
]


def pubmed_topics_stage(
    df: DataFrame, xml_col: str = "html", on_error: str = "raise"
) -> DataFrame:
    """Extract ``(article_topics, medline_ta)`` from a PubMed-XML column.

    One vectorized Arrow pass (``mapInPandas``) — the distributed analogue
    of the reference's per-file ``get_topics_for_*`` driver loop; all input
    columns pass through unchanged.

    ``on_error="raise"`` (default) fails loud on malformed XML — the
    reference's behavior on its curated corpora. ``on_error="skip"`` emits
    ``([], NULL)`` for unparseable rows instead: on an open-web corpus one
    corrupt page must not kill a 10^12-document job.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")
    schema = T.StructType(list(df.schema.fields) + _TOPICS_SCHEMA_FIELDS)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            topics, tas = [], []
            for raw in pdf[xml_col]:
                try:
                    ts, ta = pubmed_article_topics(raw)
                except ElementTree.ParseError:
                    if on_error == "raise":
                        raise
                    ts, ta = [], None
                topics.append(ts)
                tas.append(ta)
            pdf["article_topics"] = topics
            pdf["medline_ta"] = tas
            yield pdf

    return df.mapInPandas(_extract, schema=schema)


def attach_journal_topics(
    topics_df: DataFrame, catalog: DataFrame
) -> DataFrame:
    """Attach ``journal_topics`` by joining ``medline_ta`` against the
    local NLM-catalog stand-in ``(medline_ta, journal_topics)``.

    The catalog is journal-count-sized (tiny) → broadcast. Articles whose
    journal is not in the catalog get an empty list (the reference returns
    ``None`` and its rule checker treats that as no journal topics).
    """
    return topics_df.join(
        F.broadcast(catalog), on="medline_ta", how="left"
    ).withColumn(
        "journal_topics",
        F.coalesce(F.col("journal_topics"), F.array().cast("array<string>")),
    )
