"""Learned linear artifacts through the model slots (VERDICT r3 item 2).

Requires the committed artifacts under ``models/`` (regenerate
deterministically with ``python tools/train_linear_models.py``).
Covers: artifact integrity (parquet ↔ JSON sidecar agreement, recorded
holdout quality), JVM broadcast-weight scoring parity vs a numpy
reference, the Arrow-path LinearREModel contract (including exact
feature recovery from the annotated sentence), deployment parity of the
trained relation model vs the engine's rule scorer (the P/R ≥ 0.95
claim), and the flagship pipeline with ``learned_models=True``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_spark.operators import linear_models as lm

pytestmark = pytest.mark.skipif(
    not os.path.exists(lm.NER_WEIGHTS_PARQUET),
    reason="models/ not trained (run tools/train_linear_models.py)",
)


def _meta(path):
    with open(path) as f:
        return json.load(f)


# -- artifact integrity -----------------------------------------------------

def test_artifacts_consistent():
    for pq, js, feats in [
        (lm.NER_WEIGHTS_PARQUET, lm.NER_WEIGHTS_JSON, lm.NER_FEATURES),
        (lm.RE_WEIGHTS_PARQUET, lm.RE_WEIGHTS_JSON, lm.RE_FEATURES),
    ]:
        meta = _meta(js)
        wdf = pd.read_parquet(pq)
        by_name = dict(zip(wdf["feature"], wdf["weight"]))
        assert meta["features"] == list(feats)
        assert [by_name[f] for f in feats] == meta["weights"]
        assert by_name["__bias__"] == meta["bias"]


def test_training_quality_recorded():
    """The committed artifact records genuine holdout quality: the RE
    model reproduces the rule labels at P/R >= 0.95 (its training gate);
    the NER scorer separates true mentions from negatives well above
    chance."""
    re_m = _meta(lm.RE_WEIGHTS_JSON)["trained"]["holdout_metrics"]
    assert re_m["precision"] >= 0.95 and re_m["recall"] >= 0.95
    ner_m = _meta(lm.NER_WEIGHTS_JSON)["trained"]["holdout_metrics"]
    assert ner_m["auc"] >= 0.9


# -- JVM path: broadcast weights + codegen dot/sigmoid ----------------------

def test_score_mentions_linear_matches_numpy(spark):
    rows = [
        ("u1", "a", 0, 0, "Insulin", 4, "CHEMICAL",
         "The Insulin level rose."),
        ("u1", "a", 0, 1, "rose", 18, "DISEASE", "The Insulin level rose."),
        ("u2", "b", 1, 0, "ACE2-like", 0, "PROTEIN", "ACE2-like binding."),
        ("u2", "b", 1, 1, "DNA polymerase", 3, "PROTEIN",
         "A DNA polymerase x."),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, uid string, ppos int, spos int, mention string,"
        " start_char int, entity_type string, text string",
    )
    w = lm.weights_row(spark, lm.NER_WEIGHTS_PARQUET, lm.NER_FEATURES)
    got = {
        (r.url, r.spos): r.score
        for r in lm.score_mentions_linear(df, w).collect()
    }
    meta = _meta(lm.NER_WEIGHTS_JSON)
    wv = np.asarray(meta["weights"])
    for url, uid, ppos, spos, m, start, et, text in rows:
        toks = len(m.split())
        feats = np.array([
            len(m) / 32.0,
            toks / 8.0,
            float("A" <= m[0] <= "Z"),
            float(m == m.upper() and any(c.isalpha() for c in m)),
            sum(c.isdigit() for c in m) / max(len(m), 1),
            sum("A" <= c <= "Z" for c in m) / max(len(m), 1),
            float("-" in m),
            float(toks > 1),
            start / max(len(text), 1),
        ] + [float(et == t) for t in lm.ETYPES])
        z = float(feats @ wv + meta["bias"])
        expect = round(1.0 / (1.0 + np.exp(-z)), 6)
        assert abs(got[(url, spos)] - expect) <= 1e-6, (m, got[(url, spos)])


def test_weights_row_is_broadcast(spark):
    """The 1-row weight table joins via broadcast — no shuffle of the
    mention stream for the model pass."""
    df = spark.createDataFrame(
        [("u", "a", 0, 0, "Insulin", 0, "CHEMICAL", "Insulin.")],
        "url string, uid string, ppos int, spos int, mention string,"
        " start_char int, entity_type string, text string",
    )
    w = lm.weights_row(spark, lm.NER_WEIGHTS_PARQUET, lm.NER_FEATURES)
    plan = lm.score_mentions_linear(df, w)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# -- Arrow path: the predict_probs_batch contract ---------------------------

def test_linear_re_model_contract():
    from search_spark.operators.relations import DIFF, SAME

    reg = lm.linear_re_registry()
    from search_spark.datagen import RELATION_PAIRS

    assert set(reg) == set(RELATION_PAIRS)
    model = next(iter(reg.values()))
    assert model.classes == [SAME, DIFF]
    annotated = pd.Series([
        "The [[ Glucose ]] rises with << Gene2 >> daily.",
    ])
    probs = model.predict_probs_batch(annotated)
    assert list(probs.columns) == [SAME, DIFF]
    assert np.allclose(probs.sum(axis=1), 1.0)
    # row 0: Glucose vs Gene2 — same first letter, model trained on the
    # first-letter rule must say SAME
    assert probs.iloc[0][SAME] > 0.5


def test_linear_re_model_rejects_ambiguous_delimiters():
    """ADVICE r4: a row whose text collides with the annotation
    delimiters must FAIL extraction loudly, not silently score wrong
    features."""
    import pytest

    model = next(iter(lm.linear_re_registry().values()))
    bad = pd.Series([
        "Some << Insulin ]] like [[ Insulin ]] and << Insulin >> x.",
    ])
    with pytest.raises(ValueError, match="exactly once"):
        model.predict_probs_batch(bad)


def test_linear_re_model_newline_span():
    """(?s) extraction: spans containing newlines recover exactly."""
    model = next(iter(lm.linear_re_registry().values()))
    probs = model.predict_probs_batch(pd.Series([
        "A [[ Gluc\nose ]] near << Gene2 >> end.",
    ]))
    assert np.allclose(probs.sum(axis=1), 1.0)


def test_linear_re_model_feature_recovery():
    """Feature recovery from the annotated sentence is EXACT: probs match
    a direct computation from the raw pair geometry."""
    from search_spark.operators.relations import annotate_sentence

    meta = _meta(lm.RE_WEIGHTS_JSON)
    w = np.asarray(meta["weights"])
    b = meta["bias"]
    model = next(iter(lm.linear_re_registry().values()))
    text = "Alpha beta Glucose gamma delta Gene2 epsilon."
    cases = [
        ((11, 18), (31, 36)),   # Glucose then Gene2
        ((31, 36), (11, 18)),   # object first in the sentence
    ]
    for span1, span2 in cases:
        s = annotate_sentence(text, span1, span2)
        p_model = model.predict_probs_batch(pd.Series([s])).iloc[0][
            meta["positive_class"]
        ]
        subj = text[span1[0]:span1[1]]
        obj = text[span2[0]:span2[1]]
        gap = max(span1[0], span2[0]) - min(span1[1], span2[1])
        x = np.array([
            float(subj[0].lower() == obj[0].lower()),
            gap / 64.0,
            len(subj) / 32.0,
            len(obj) / 32.0,
            float(span1[0] < span2[0]),
        ])
        expect = float(np.round(1.0 / (1.0 + np.exp(-(x @ w + b))), 6))
        assert p_model == expect, (span1, span2, p_model, expect)


def test_re_model_parity_vs_rule(spark):
    """Deployment parity: the trained model's argmax agrees with the
    engine's JVM rule scorer at P/R >= 0.95 over a fresh corpus (not the
    training one)."""
    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, build_triples

    pages = datagen.generate_web_pages(spark, 60, seed=99)
    rule = build_triples(spark, pages, PipelineConfig()) \
        .select("subj", "pred", "obj", "prov").distinct()
    learned = build_triples(
        spark, pages, PipelineConfig(learned_models=True)
    ).select("subj", "pred", "obj", "prov").distinct()
    n_rule = rule.count()
    n_learned = learned.count()
    n_common = rule.intersect(learned).count()
    assert n_common / n_rule >= 0.95       # recall vs rule triples
    assert n_common / n_learned >= 0.95    # precision vs rule triples


# -- flagship with models live ---------------------------------------------

def test_pipeline_learned_models_runs(spark):
    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, build_triples

    pages = datagen.generate_web_pages(spark, 20, seed=5)
    out = build_triples(spark, pages, PipelineConfig(learned_models=True))
    rows = out.limit(5).collect()
    assert rows and set(
        ["subj", "pred", "obj", "prov"]
    ) <= set(out.columns)
