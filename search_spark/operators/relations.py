"""Stage 4 — relation extraction over co-sentence mention pairs.

Reference analogue: for every *ordered* pair of distinct entities detected in
one sentence whose ``(subject_type, object_type)`` has a registered model,
annotate the sentence and predict a relation class
(mining/pipeline.py:131-156; REModel, mining/relation.py:26-98).

Spark-first design: pair generation is a **self-equi-join of mentions on the
sentence key** ``(url, ppos, spos)`` — not a Python loop — filtered to
registered type pairs by a **broadcast join** against the (tiny) model-pair
table. The sandbox relation model is the reference's own deterministic toy,
``StartWithTheSameLetter`` (relation.py:252-284), which needs only the first
letters of the two mentions — so scoring itself is a JVM-side CASE
expression and the whole stage runs inside WholeStageCodegen with **zero
Python**. A pluggable pandas-UDF scorer hook (``score_pairs_udf``) covers
real transformer REModels: it receives the annotated sentence built by
:func:`annotate_sentence` (the reference's annotate(), relation.py:101-180).

Skew/blowup control (SURVEY.md §7.3): pairs per sentence are O(k²); mentions
are capped per sentence *before* the join (row_number ≤ ``max_per_sentence``
ordered by start offset — deterministic).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SAME = "START_WITH_SAME_LETTER"
DIFF = "START_WITH_DIFFERENT_LETTER"

SENTENCE_KEY = ["url", "uid", "ppos", "spos"]


def annotate_sentence(
    text: str,
    span1: tuple[int, int],
    span2: tuple[int, int],
    symbols1: tuple[str, str] = ("[[ ", " ]]"),
    symbols2: tuple[str, str] = ("<< ", " >>"),
) -> str:
    """Wrap two entity spans of a sentence with model-specific symbols.

    Char-offset analogue of the reference's token-walk ``annotate``
    (relation.py:101-180): same information content — the sentence with the
    subject and object delimited by the REModel's symbols.
    """
    (s1, e1), (s2, e2) = span1, span2
    if (s1, e1) == (s2, e2):
        raise ValueError("need two distinct entity spans")
    pieces = sorted(
        [(s1, e1, symbols1), (s2, e2, symbols2)], key=lambda p: p[0]
    )
    (a_s, a_e, a_sym), (b_s, b_e, b_sym) = pieces
    if a_e > b_s:
        raise ValueError("entity spans overlap")
    return (
        text[:a_s]
        + a_sym[0] + text[a_s:a_e] + a_sym[1]
        + text[a_e:b_s]
        + b_sym[0] + text[b_s:b_e] + b_sym[1]
        + text[b_e:]
    ).strip()


def cap_mentions_per_sentence(
    mentions: DataFrame, max_per_sentence: int = 50
) -> DataFrame:
    """Deterministically cap mentions per sentence to bound the pair join."""
    w = Window.partitionBy(*SENTENCE_KEY).orderBy("start_char", "end_char")
    return (
        mentions.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= max_per_sentence)
        .drop("_rank")
    )


class REModel:
    """Batched relation-extraction model contract — the reference's
    ``REModel`` (mining/relation.py:26-98) with ``predict_probs`` ported to
    the Arrow-batch shape the north rule mandates:

    * ``classes`` — relation class names (relation.py:34-41),
    * ``symbols`` — entity_type → (left, right) annotation symbols
      (relation.py:89-98),
    * ``predict_probs_batch(pd.Series) -> pd.DataFrame`` — one column per
      class, one row per annotated sentence: the reference's per-sentence
      ``pd.Series`` probability vector (relation.py:43-61), vectorized.

    ``predict`` (argmax + confidence, relation.py:63-87) is what
    :func:`remodel_scorer` applies column-wise after the batch call.
    """

    classes: list[str]
    symbols: dict[str, tuple[str, str]]

    def predict_probs_batch(self, annotated):  # pragma: no cover - contract
        raise NotImplementedError


class StartWithSameLetterModel(REModel):
    """The reference's own deterministic toy REModel
    (``StartWithTheSameLetter``, relation.py:252-284) under the batched
    probability contract: P=1 for the matching class, 0 otherwise."""

    classes = [SAME, DIFF]
    symbols: dict[str, tuple[str, str]] = {}

    def __init__(self, entity_types: tuple[str, str] = ("SUBJ", "OBJ")):
        self.symbols = {
            entity_types[0]: ("[[ ", " ]]"),
            entity_types[1]: ("<< ", " >>"),
        }

    def predict_probs_batch(self, annotated):
        import pandas as pd

        def probs(s: str) -> tuple[float, float]:
            # first letters of the two annotated entities
            import re

            m1 = re.search(r"\[\[ (.)", s)
            m2 = re.search(r"<< (.)", s)
            same = (
                m1 is not None
                and m2 is not None
                and m1.group(1).lower() == m2.group(1).lower()
            )
            return (1.0, 0.0) if same else (0.0, 1.0)

        return pd.DataFrame(
            [probs(s) for s in annotated], columns=self.classes,
            index=annotated.index,
        )


def remodel_scorer(
    models: dict[tuple[str, str], REModel], sentences: DataFrame
) -> Callable[[DataFrame], DataFrame]:
    """Build a ``relation_stage`` scorer from a (subj_type, obj_type) →
    :class:`REModel` registry — the reference's ``models_relations`` dict
    (mining/pipeline.py:131-156), like ``ner_stage_multi`` is for NER.

    The returned scorer joins the sentence text back onto the pairs (the
    pairs stream carries only offsets), then runs ONE Arrow pass per batch:
    rows group by type pair, each group's sentences are annotated with that
    model's symbols (:func:`annotate_sentence`) and scored with one
    ``predict_probs_batch`` call; ``property`` is the per-row argmax class
    and ``property_prob`` its probability (``predict(return_prob=True)``,
    relation.py:63-87).
    """
    import pandas as pd
    from pyspark.sql import types as T

    def scorer(pairs: DataFrame) -> DataFrame:
        with_text = pairs.join(
            sentences.select(*SENTENCE_KEY, "text"), on=SENTENCE_KEY
        )
        out_schema = T.StructType(
            list(with_text.schema.fields)
            + [
                T.StructField("property", T.StringType(), False),
                T.StructField("property_prob", T.DoubleType(), False),
            ]
        )

        def _score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                prop = pd.Series("", index=pdf.index, dtype=object)
                prob = pd.Series(0.0, index=pdf.index)
                for (st, ot), grp in pdf.groupby(["s_type", "o_type"]):
                    model = models.get((st, ot))
                    if model is None:
                        continue  # pair filter should have removed these
                    sym1 = model.symbols.get(st, ("[[ ", " ]]"))
                    sym2 = model.symbols.get(ot, ("<< ", " >>"))
                    annotated = grp.apply(
                        lambda r: annotate_sentence(
                            r["text"],
                            (r["s_start"], r["s_end"]),
                            (r["o_start"], r["o_end"]),
                            sym1,
                            sym2,
                        ),
                        axis=1,
                    )
                    probs = model.predict_probs_batch(annotated)
                    prop.loc[grp.index] = probs.idxmax(axis=1)
                    prob.loc[grp.index] = probs.max(axis=1)
                pdf = pdf.copy()
                pdf["property"] = prop
                pdf["property_prob"] = prob
                yield pdf

        return with_text.mapInPandas(_score, schema=out_schema)

    return scorer


def relation_stage(
    mentions: DataFrame,
    relation_pairs: DataFrame,
    max_per_sentence: int = 50,
    scorer: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Generate ordered co-sentence entity pairs and score the relation.

    Parameters
    ----------
    relation_pairs
        Tiny DataFrame ``(subj_type, obj_type)`` of registered model pairs —
        broadcast-joined (reference: ``models_relations`` dict keys).
    scorer
        Optional pandas-UDF scorer replacing the default JVM-side
        StartWithTheSameLetter expression; receives the pairs DataFrame with
        an ``annotated`` column and must add a ``property`` column.

    Returns the relation rows in SPECS orientation:
        (url, uid, ppos, spos, section, entity, entity_type, start_char,
         end_char, property, property_value, property_value_type)
    """
    capped = cap_mentions_per_sentence(mentions, max_per_sentence)

    subj = capped.select(
        *SENTENCE_KEY,
        "section",
        F.col("start_char").alias("s_start"),
        F.col("end_char").alias("s_end"),
        F.col("mention").alias("s_mention"),
        F.col("entity_type").alias("s_type"),
    )
    obj = capped.select(
        *SENTENCE_KEY,
        F.col("start_char").alias("o_start"),
        F.col("end_char").alias("o_end"),
        F.col("mention").alias("o_mention"),
        F.col("entity_type").alias("o_type"),
    )
    pairs = (
        subj.join(obj, on=SENTENCE_KEY, how="inner")
        # distinct spans — the reference's `s_ent == o_ent: continue`
        .filter(
            (F.col("s_start") != F.col("o_start"))
            | (F.col("s_end") != F.col("o_end"))
        )
        .join(
            F.broadcast(
                relation_pairs.withColumnRenamed("subj_type", "s_type")
                .withColumnRenamed("obj_type", "o_type")
            ),
            on=["s_type", "o_type"],
            how="inner",  # only pairs with a registered model survive
        )
    )

    if scorer is None:
        # StartWithTheSameLetter, JVM-side (relation.py:266-278).
        pairs = pairs.withColumn(
            "property",
            F.when(
                F.lower(F.substring("s_mention", 1, 1))
                == F.lower(F.substring("o_mention", 1, 1)),
                F.lit(SAME),
            ).otherwise(F.lit(DIFF)),
        )
    else:
        pairs = scorer(pairs)

    # a probability-contract scorer (remodel_scorer) adds property_prob —
    # keep it when present (predict(return_prob=True), relation.py:63-87)
    extra = ["property_prob"] if "property_prob" in pairs.columns else []
    return pairs.select(
        *SENTENCE_KEY,
        "section",
        F.col("s_mention").alias("entity"),
        F.col("s_type").alias("entity_type"),
        F.col("s_start").alias("start_char"),
        F.col("s_end").alias("end_char"),
        "property",
        F.col("o_mention").alias("property_value"),
        F.col("o_type").alias("property_value_type"),
        *extra,
    )
