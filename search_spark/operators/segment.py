"""Stage 2 — segment: ``paragraphs`` → ``sentences``.

Reference analogue: spaCy sentence segmentation at DB-add time
(entrypoint/database/add.py:140-153, database/cord_19.py:423-458) plus the
bad-sentence predicates (cord_19.py:64-76) and the 60 000-char truncation
(cord_19.py:127, 221-230).

Spark-first design: the segmenter is a *deterministic regex split* evaluated
entirely JVM-side — ``split`` + ``posexplode`` — so segmentation stays inside
WholeStageCodegen with no Python boundary at all. (A pluggable
``mapInPandas`` hook exists for model-based segmenters; the rule segmenter is
the sandbox default, mirroring how the reference ships rule-based components
when models are unavailable.)

Output schema (deterministic composite key — schemas.py:66-71):
    sentences(url, uid, ppos, spos, section, text, is_bad)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Split *after* a sentence terminator followed by whitespace. Java regex
# (JVM-side) supports the lookbehind; the segmenter is a pure function of the
# text, hence deterministic and order-independent.
SENTENCE_SPLIT_REGEX = r"(?<=[.!?])\s+"

MAX_TEXT_CHARS = 60_000  # cord_19.py:127 clips text at 60k chars
LATEX_REGEX = r"\\[a-z]+\{"  # cord_19.py:69
MIN_SENT_CHARS = 20  # cord_19.py:72
MAX_SENT_CHARS = 2_000  # cord_19.py:75


def segment_stage(paragraphs: DataFrame) -> DataFrame:
    """Split paragraph text into position-numbered sentences.

    ``posexplode`` assigns ``sentence_pos_in_paragraph`` for free (no window
    function, no shuffle — positions are derived within the row).
    """
    truncated = F.substring(F.col("text"), 1, MAX_TEXT_CHARS)
    exploded = paragraphs.select(
        "url",
        "uid",
        "ppos",
        "section",
        F.posexplode(F.split(truncated, SENTENCE_SPLIT_REGEX)).alias(
            "spos", "sent_text"
        ),
    ).filter(F.length("sent_text") > 0)

    return exploded.select(
        "url",
        "uid",
        "ppos",
        "spos",
        "section",
        F.col("sent_text").alias("text"),
        (
            F.col("sent_text").rlike(LATEX_REGEX)
            | (F.length("sent_text") < MIN_SENT_CHARS)
            | (F.length("sent_text") > MAX_SENT_CHARS)
        ).alias("is_bad"),
    )
