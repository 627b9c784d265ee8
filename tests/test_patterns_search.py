"""Tests for PatternStore (PatternCreator slot), semantic search with
deprioritization, and the model-shaped NER scoring pass."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from search_spark.operators.patterns import PatternStore, filter_spans

SF_DIR = "/root/testdata/sf0.001"


# -- PatternStore ----------------------------------------------------------

def test_filter_spans_prefers_longer_then_earlier():
    spans = [
        (0, 5, "alpha", "A"),
        (3, 12, "pha-beta", "B"),  # longer, overlapping → wins
        (13, 17, "gamma", "C"),
    ]
    kept = filter_spans(spans)
    assert kept == [(3, 12, "pha-beta", "B"), (13, 17, "gamma", "C")]


def test_pattern_store_phrase_and_regex_matching():
    store = (
        PatternStore()
        .add_phrase("CHEMICAL", "Glucose")
        .add_phrase("CHEMICAL", "acetylsalicylic acid", case_sensitive=False)
        .add_regex("DOSE", r"\b\d+\s?mg\b")
    )
    m = store.compile()
    spans = m.find("Take 50 mg of Acetylsalicylic Acid with Glucose.")
    found = {(s[2], s[3]) for s in spans}
    assert ("50 mg", "DOSE") in found
    assert ("Acetylsalicylic Acid", "CHEMICAL") in found
    assert ("Glucose", "CHEMICAL") in found


def test_pattern_store_jsonl_roundtrip(tmp_path):
    store = PatternStore().add_phrase("X", "foo").add_regex("Y", r"ba+r")
    p = str(tmp_path / "patterns.jsonl")
    store.to_jsonl(p)
    back = PatternStore.from_jsonl(p)
    assert back.rows == store.rows


def test_ner_stage_accepts_pattern_store(spark):
    from search_spark import datagen
    from search_spark.extraction.extract import extract_stage
    from search_spark.operators.ner import ner_stage
    from search_spark.operators.segment import segment_stage

    pages = datagen.generate_web_pages(spark, 10, seed=42)
    sentences = segment_stage(extract_stage(pages))
    store = PatternStore.from_gazetteer(
        [(t, e) for e, ts in datagen.GAZETTEER.items() for t in ts]
    )
    via_store = ner_stage(sentences, store)
    via_list = ner_stage(
        sentences, [(t, e) for e, ts in datagen.GAZETTEER.items() for t in ts]
    )
    # same corpus, same patterns → identical mention multisets (our corpus
    # has no overlapping-span cases that would distinguish the two policies)
    a = sorted(map(tuple, via_store.collect()))
    b = sorted(map(tuple, via_list.collect()))
    assert a == b


# -- semantic search -------------------------------------------------------

def test_semantic_topk_matches_brute_force(spark):
    from search_spark.operators.search import semantic_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = semantic_topk(emb.filter(F.col("vec_id") != 0),
                        [float(x) for x in q], k=5).collect()
    # brute force in python
    rows = emb.filter(F.col("vec_id") != 0).collect()
    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return d / (na * nb)
    expect = sorted(
        ((round(cos(r["embedding"], q), 4), -r["vec_id"]) for r in rows),
        reverse=True,
    )[:5]
    got = [(r["score"], -r["vec_id"]) for r in top]
    assert got == expect


def test_deprioritization_moves_results(spark):
    from search_spark.operators.search import (
        DEPRIORITIZATION_WEIGHTS,
        semantic_topk,
    )

    assert DEPRIORITIZATION_WEIGHTS["Stronger"] == (0.5, 0.7)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    d = [float(x) for x in emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]]
    plain = [r["vec_id"] for r in semantic_topk(emb, q, k=10).collect()]
    moved = [
        r["vec_id"]
        for r in semantic_topk(
            emb, q, k=10, deprioritize_vec=d, strength="Stronger"
        ).collect()
    ]
    assert plain != moved  # deprioritization must change the ranking


# -- NER scoring (model slot) ---------------------------------------------

def test_ner_scoring_deterministic_and_batched(spark):
    from search_spark import datagen
    from search_spark.extraction.extract import extract_stage
    from search_spark.operators.ner import ner_stage
    from search_spark.operators.segment import segment_stage

    pages = datagen.generate_web_pages(spark, 8, seed=42)
    sentences = segment_stage(extract_stage(pages))
    scored = ner_stage(sentences, datagen.GAZETTEER_FLAT, with_scores=True)
    rows1 = sorted(map(tuple, scored.collect()))
    rows2 = sorted(map(tuple, scored.collect()))
    assert rows1 == rows2  # deterministic across executions
    assert all(0.0 < r[-1] < 1.0 for r in rows1)  # sigmoid confidence
    # score column present; mention columns unchanged vs unscored run
    plain = sorted(
        map(tuple, ner_stage(sentences, datagen.GAZETTEER_FLAT).collect())
    )
    assert [r[:-1] for r in rows1] == plain
