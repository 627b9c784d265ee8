"""Lightweight coreference: pronoun → nearest preceding entity mention.

The reference pipeline detects entity *mentions* only (mining/pipeline.py's
NER stage); pronouns referring back to those entities are invisible to its
relation extractor, so cross-sentence facts ("Alice founded X. She also
founded Y.") drop the subject. This operator closes that recall gap with the
classic recency heuristic — each third-person pronoun resolves to the most
recent preceding mention in the same document whose grammatical number
agrees (they/them/their → plural-capable mentions; he/she/it/him/her/its →
singular) — the deterministic core of rule-based coreference (Hobbs-style
recency without the parse tree).

Distributed shape: one ``posexplode`` of the token stream, one window
``last(..., ignorenulls=True)`` partitioned by ``doc_id`` ordered by
``(sent_pos, tok_pos)``. The window state is one value per partition key —
no growing buffer — and documents are the partition unit, so at 10^12 docs
this is a single shuffle on ``doc_id`` with per-doc work linear in tokens.
Skew: the longest document bounds a task; the upstream 60k-char truncation
(operators/segment.py) caps that, as in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SINGULAR_PRONOUNS = ("he", "she", "it", "him", "her", "its", "his", "hers")
PLURAL_PRONOUNS = ("they", "them", "their", "theirs")


def resolve_pronouns(
    sentences: DataFrame, mentions: DataFrame
) -> DataFrame:
    """Resolve pronouns in ``sentences`` against ``mentions``.

    ``sentences``: ``(doc_id, sent_pos, text)`` — the segmented stream.
    ``mentions``: ``(doc_id, sent_pos, tok_pos, entity, is_plural)`` —
    token-anchored mention rows (``tok_pos`` is the 0-based whitespace-token
    index of the mention head within its sentence).

    Returns ``(doc_id, sent_pos, tok_pos, pronoun, antecedent)`` — one row
    per pronoun token that found a number-agreeing antecedent earlier in the
    document (mentions in the same sentence count if strictly earlier by
    token position). Pronouns with no preceding agreeing mention are
    dropped.

    Tokenization is bare whitespace with trailing ASCII punctuation
    stripped before the pronoun-lexicon check, matching the segmenter's
    token accounting.
    """
    toks = sentences.select(
        "doc_id",
        "sent_pos",
        F.posexplode(F.split("text", " ")).alias("tok_pos", "tok"),
    ).withColumn(
        "word", F.lower(F.regexp_replace("tok", r"[.,;:!?]+$", ""))
    )
    m = mentions.select(
        "doc_id",
        "sent_pos",
        "tok_pos",
        F.col("entity").alias("m_entity"),
        F.col("is_plural").alias("m_plural"),
    )
    events = toks.join(m, ["doc_id", "sent_pos", "tok_pos"], "left")

    w = (
        Window.partitionBy("doc_id")
        .orderBy("sent_pos", "tok_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sing = F.when(~F.col("m_plural"), F.col("m_entity"))
    plur = F.when(F.col("m_plural"), F.col("m_entity"))
    resolved = events.select(
        "doc_id",
        "sent_pos",
        "tok_pos",
        "word",
        F.last(sing, ignorenulls=True).over(w).alias("last_singular"),
        F.last(plur, ignorenulls=True).over(w).alias("last_plural"),
    )
    antecedent = (
        F.when(
            F.col("word").isin(*SINGULAR_PRONOUNS), F.col("last_singular")
        )
        .when(F.col("word").isin(*PLURAL_PRONOUNS), F.col("last_plural"))
    )
    return (
        resolved.withColumn("antecedent", antecedent)
        .filter(F.col("antecedent").isNotNull())
        .select(
            "doc_id",
            "sent_pos",
            "tok_pos",
            F.col("word").alias("pronoun"),
            "antecedent",
        )
    )
