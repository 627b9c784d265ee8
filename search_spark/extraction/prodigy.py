"""Prodigy annotation loader — JSONL → per-token IOB2 rows.

Port of ``annotations2df`` (mining/eval.py:92-156, the pure-JSONL part —
no spaCy needed): each accepted Prodigy record contributes one row per
token with columns ``(source, class, start_char, end_char, id, text)``;
``class`` is the IOB2 tag derived from the record's entity spans
(``B-LABEL`` for the first token of a span, ``I-LABEL`` for the rest,
``not_entity_symbol`` elsewhere; labels are upper-cased). Records with
``answer != "accept"`` are skipped.

Spark-first: the reference loops over annotation files on the driver; here
the JSONL lines are a DataFrame column (``spark.read.text`` on any number
of files) and the per-line conversion runs as one vectorized Arrow pass —
annotation sets of any size load in parallel. The per-line function
:func:`annotation_rows` is importable on its own for driver-side use and
parity tests.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def annotation_rows(
    jsonl_line: str, not_entity_symbol: str = "O"
) -> list[dict]:
    """Token rows of one Prodigy JSONL record (eval.py:120-151 inner loop);
    empty list for rejected/ignored records."""
    content = json.loads(jsonl_line)
    if content["answer"] != "accept":
        return []
    spans = content.get("spans", [])
    classes: dict[int, str] = {}
    for ent in spans:
        for ix, token_ix in enumerate(
            range(ent["token_start"], ent["token_end"] + 1)
        ):
            ent_label = ent["label"].upper()
            classes[token_ix] = "{}-{}".format(
                "B" if ix == 0 else "I", ent_label
            )
    return [
        {
            "source": content["meta"]["source"],
            "class": classes.get(token["id"], not_entity_symbol),
            "start_char": token["start"],
            "end_char": token["end"],
            "id": token["id"],
            "text": token["text"],
        }
        for token in content["tokens"]
    ]


ANNOTATION_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("class", T.StringType(), False),
        T.StructField("start_char", T.LongType(), False),
        T.StructField("end_char", T.LongType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def annotations_stage(
    df: DataFrame, line_col: str = "value", not_entity_symbol: str = "O"
) -> DataFrame:
    """Convert a DataFrame of raw Prodigy JSONL lines (e.g. from
    ``spark.read.text``) into token rows — one Arrow pass, no driver
    loop."""

    def _convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for line in pdf[line_col]:
                if line and line.strip():
                    rows.extend(annotation_rows(line, not_entity_symbol))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in ANNOTATION_SCHEMA.fields],
            )

    return df.mapInPandas(_convert, schema=ANNOTATION_SCHEMA)
