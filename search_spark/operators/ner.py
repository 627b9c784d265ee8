"""Stage 3 — NER mention detection: ``sentences`` → ``mentions``.

Reference analogue: per-entity-type spaCy models + rule-based
``EntityRuler`` patterns (mining/pipeline.py:39-162; patterns from
``PatternCreator``, mining/entity.py:30-380). The sandbox default is the
rule path: a gazetteer of exact phrases per entity type, matched
leftmost-longest and non-overlapping (EntityRuler semantics), case-sensitive.

Execution model (SURVEY.md §2.10): one Arrow-batched ``mapInPandas`` pass
over sentences with the compiled matcher initialized **lazily once per
executor process** — the same pattern a transformer model would use (load
weights once per executor, batch inference per Arrow batch). Swapping the
gazetteer for a real model changes only ``_match_batch``.

Output schema (SPECS-aligned, mining/pipeline.py:25-36; char offsets are
sentence-relative, ``[start_char, end_char)``):
    mentions(url, uid, ppos, spos, section, start_char, end_char,
             mention, entity_type)

``NaE``-typed entities are excluded *after* matching, exactly like the
reference (mining/pipeline.py:113-117) — as a JVM-side filter.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXCLUDED_ENTITY_TYPE = "NaE"

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("uid", T.StringType(), False),
        T.StructField("ppos", T.IntegerType(), False),
        T.StructField("spos", T.IntegerType(), False),
        T.StructField("section", T.StringType(), True),
        T.StructField("start_char", T.IntegerType(), False),
        T.StructField("end_char", T.IntegerType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
    ]
)

# Per-executor matcher cache: compiled once per (patterns) value, reused for
# every Arrow batch the executor processes.
_MATCHER_CACHE: dict[tuple, "GazetteerMatcher"] = {}


class GazetteerMatcher:
    """Leftmost-longest, non-overlapping exact-phrase matcher.

    Longest-pattern-first alternation makes Python's regex engine pick the
    longest phrase starting at each position; ``finditer`` then guarantees
    non-overlap — together, spaCy EntityRuler span-filtering semantics.
    """

    def __init__(self, patterns: Sequence[tuple[str, str]]):
        ordered = sorted(patterns, key=lambda p: (-len(p[0]), p[0]))
        self._etype = {term: etype for term, etype in patterns}
        alternation = "|".join(re.escape(term) for term, _ in ordered)
        self._re = re.compile(rf"\b(?:{alternation})\b")

    def find(self, text: str) -> list[tuple[int, int, str, str]]:
        """Return ``(start_char, end_char, mention, entity_type)`` spans."""
        return [
            (m.start(), m.end(), m.group(0), self._etype[m.group(0)])
            for m in self._re.finditer(text)
        ]


def get_matcher(patterns):
    """Compile-once-per-executor matcher for either pattern representation:
    a plain ``(term, entity_type)`` gazetteer (GazetteerMatcher) or a
    :class:`~search_spark.operators.patterns.PatternStore` (regex/phrase
    rules with EntityRuler-style span filtering)."""
    from search_spark.operators.patterns import PatternStore

    if isinstance(patterns, PatternStore):
        key = ("store",) + tuple(patterns.rows)
        matcher = _MATCHER_CACHE.get(key)
        if matcher is None:
            matcher = _MATCHER_CACHE[key] = patterns.compile()
        return matcher
    key = tuple(sorted(patterns))
    matcher = _MATCHER_CACHE.get(key)
    if matcher is None:
        matcher = _MATCHER_CACHE[key] = GazetteerMatcher(patterns)
    return matcher


def ner_stage_multi(
    sentences: DataFrame,
    models: dict[str, object],
    skip_bad: bool = True,
    excluded_entity_type: str | None = EXCLUDED_ENTITY_TYPE,
) -> DataFrame:
    """Model-**per-entity-type** registry pass — the reference's
    ``model-{etype}`` convention (one spaCy model per entity type, loaded
    per worker: mining_cache.py:84, naming validated utils.py:544-627).

    ``models`` maps entity type → matcher spec (a ``(term, etype)``
    gazetteer or a :class:`PatternStore`). All models run **fused** in one
    Arrow pass (each initialized once per executor via the matcher cache),
    emitting the union of their mentions exactly like the reference's
    one-queue-per-model mining; each model's output is validated to its
    own entity type (the reference's model-vs-meta.json label check) —
    spans a model emits for other types are dropped.
    """
    src = sentences
    if skip_bad:
        src = src.filter(~F.col("is_bad"))
    src = src.select("url", "uid", "ppos", "spos", "section", "text")
    model_items = tuple(sorted(models.items()))

    def _match_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matchers = [(etype, get_matcher(spec)) for etype, spec in model_items]
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in MENTIONS_SCHEMA.fields}
            for url, uid, ppos, spos, section, text in zip(
                pdf["url"], pdf["uid"], pdf["ppos"], pdf["spos"],
                pdf["section"], pdf["text"],
            ):
                for model_etype, matcher in matchers:
                    for start, end, mention, etype in matcher.find(text):
                        if etype != model_etype:
                            continue  # label outside this model's type
                        rows["url"].append(url)
                        rows["uid"].append(uid)
                        rows["ppos"].append(ppos)
                        rows["spos"].append(spos)
                        rows["section"].append(section)
                        rows["start_char"].append(start)
                        rows["end_char"].append(end)
                        rows["mention"].append(mention)
                        rows["entity_type"].append(etype)
            out = pd.DataFrame(rows)
            for c in ("ppos", "spos", "start_char", "end_char"):
                out[c] = out[c].astype("int32")
            yield out

    mentions = src.mapInPandas(_match_batch, schema=MENTIONS_SCHEMA)
    if excluded_entity_type is not None:
        mentions = mentions.filter(
            F.col("entity_type") != F.lit(excluded_entity_type)
        )
    return mentions


def ner_stage(
    sentences: DataFrame,
    patterns: Sequence[tuple[str, str]],
    skip_bad: bool = True,
    excluded_entity_type: str | None = EXCLUDED_ENTITY_TYPE,
    with_scores: bool = False,
) -> DataFrame:
    """Detect entity mentions in sentences with a broadcast gazetteer.

    ``patterns`` is a small list — it travels to executors inside the UDF
    closure (equivalently a broadcast variable), never as a shuffled table.

    ``with_scores=True`` additionally runs the batched model pass over the
    sentence windows (operators/ner_scoring.py — the reference's
    transformer+EntityRuler fusion, dvc.yaml train+add_er) and emits a
    per-mention ``score`` column.
    """
    src = sentences
    if skip_bad:
        # cheap JVM-side predicate *before* the Python boundary
        src = src.filter(~F.col("is_bad"))
    src = src.select("url", "uid", "ppos", "spos", "section", "text")
    if with_scores:
        from search_spark.operators.ner_scoring import score_mentions

        src = score_mentions(src)
    from search_spark.operators.patterns import PatternStore

    pattern_list = (
        patterns if isinstance(patterns, PatternStore) else tuple(patterns)
    )

    out_schema = MENTIONS_SCHEMA
    if with_scores:
        out_schema = T.StructType(
            MENTIONS_SCHEMA.fields
            + [T.StructField("score", T.DoubleType(), False)]
        )

    def _match_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = get_matcher(pattern_list)
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in out_schema.fields}
            scores = pdf["score"] if with_scores else None
            for i, (url, uid, ppos, spos, section, text) in enumerate(zip(
                pdf["url"], pdf["uid"], pdf["ppos"], pdf["spos"],
                pdf["section"], pdf["text"],
            )):
                for start, end, mention, etype in matcher.find(text):
                    rows["url"].append(url)
                    rows["uid"].append(uid)
                    rows["ppos"].append(ppos)
                    rows["spos"].append(spos)
                    rows["section"].append(section)
                    rows["start_char"].append(start)
                    rows["end_char"].append(end)
                    rows["mention"].append(mention)
                    rows["entity_type"].append(etype)
                    if scores is not None:
                        rows["score"].append(float(scores.iloc[i]))
            out = pd.DataFrame(rows)
            for c in ("ppos", "spos", "start_char", "end_char"):
                out[c] = out[c].astype("int32")
            yield out

    mentions = src.mapInPandas(_match_batch, schema=out_schema)
    if excluded_entity_type is not None:
        mentions = mentions.filter(
            F.col("entity_type") != F.lit(excluded_entity_type)
        )
    return mentions
