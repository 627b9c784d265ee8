"""Unit tests for the pipeline operators (segment, NER, relations, linking,
canonicalization, evaluation) on tiny hand-built inputs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_spark import datagen
from search_spark.operators.canonicalize import connected_components
from search_spark.operators.evaluation import entity_level_pr
from search_spark.operators.linking import cosine_col, hash_embed, link_stage
from search_spark.operators.ner import GazetteerMatcher, ner_stage
from search_spark.operators.relations import (
    DIFF,
    SAME,
    annotate_sentence,
    relation_stage,
)
from search_spark.operators.segment import segment_stage


# --- segmentation -----------------------------------------------------------

def _paragraphs_df(spark, rows):
    return spark.createDataFrame(
        rows, ["url", "uid", "ppos", "section", "text"]
    )


def test_segment_positions_and_flags(spark):
    rows = [
        ("u1", "id1", 0, "S",
         "This is the first proper sentence. And here is the second one! "
         "Short. We use \\alpha{x} to denote the learning rate value."),
    ]
    out = segment_stage(_paragraphs_df(spark, rows)).orderBy("spos").collect()
    texts = [r["text"] for r in out]
    assert texts == [
        "This is the first proper sentence.",
        "And here is the second one!",
        "Short.",
        "We use \\alpha{x} to denote the learning rate value.",
    ]
    assert [r["spos"] for r in out] == [0, 1, 2, 3]
    assert [r["is_bad"] for r in out] == [False, False, True, True]


def test_segment_truncates_long_paragraphs(spark):
    rows = [("u1", "id1", 0, "S", "x" * 70_000)]
    out = segment_stage(_paragraphs_df(spark, rows)).collect()
    assert len(out) == 1
    assert len(out[0]["text"]) == 60_000
    assert out[0]["is_bad"]  # > 2000 chars


# --- NER ---------------------------------------------------------------------

PATTERNS = [(t, e) for e, ts in datagen.GAZETTEER.items() for t in ts]


def test_gazetteer_matcher_leftmost_longest():
    m = GazetteerMatcher([("DNA polymerase", "PROTEIN"), ("DNA", "NaE")])
    spans = m.find("the DNA polymerase binds DNA here")
    assert spans == [
        (4, 18, "DNA polymerase", "PROTEIN"),
        (25, 28, "DNA", "NaE"),
    ]


def test_gazetteer_word_boundaries_and_case():
    m = GazetteerMatcher([("Glucose", "CHEMICAL")])
    assert m.find("Glucoses and glucose and xGlucose") == []
    assert m.find("plain Glucose.") == [(6, 13, "Glucose", "CHEMICAL")]


def _sentences_df(spark, rows):
    return spark.createDataFrame(
        rows, ["url", "uid", "ppos", "spos", "section", "text", "is_bad"]
    )


def test_ner_stage_offsets_and_nae_exclusion(spark):
    rows = [
        ("u1", "id1", 0, 0, "S", "Widget and Glucose bind ACE2 today.", False),
        ("u1", "id1", 0, 1, "S", "Glucose in a bad sentence.", True),
    ]
    out = ner_stage(_sentences_df(spark, rows), PATTERNS + [("Widget", "NaE")])
    got = [
        (r["spos"], r["start_char"], r["end_char"], r["mention"], r["entity_type"])
        for r in out.orderBy("start_char").collect()
    ]
    # NaE excluded (pipeline.py:113-117); bad sentence skipped entirely
    assert got == [
        (0, 11, 18, "Glucose", "CHEMICAL"),
        (0, 24, 28, "ACE2", "PROTEIN"),
    ]
    text = rows[0][5]
    for _, s, e, mention, _ in got:
        assert text[s:e] == mention


# --- relations ---------------------------------------------------------------

def test_annotate_sentence_matches_reference_shape():
    text = "Glucose binds ACE2 today."
    out = annotate_sentence(text, (0, 7), (14, 18))
    assert out == "[[ Glucose ]] binds << ACE2 >> today."
    # reversed span order uses each span's own symbols
    out2 = annotate_sentence(text, (14, 18), (0, 7))
    assert out2 == "<< Glucose >> binds [[ ACE2 ]] today."


def test_relation_stage_ordered_pairs_and_same_letter(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", "id1", 0, 0, "S", 0, 7, "Glucose", "CHEMICAL"),
            ("u1", "id1", 0, 0, "S", 14, 18, "ACE2", "PROTEIN"),
            ("u1", "id1", 0, 0, "S", 25, 32, "Malaria", "DISEASE"),
            # different sentence — never paired with the above
            ("u1", "id1", 0, 1, "S", 0, 7, "Aspirin", "CHEMICAL"),
        ],
        ["url", "uid", "ppos", "spos", "section",
         "start_char", "end_char", "mention", "entity_type"],
    )
    out = relation_stage(mentions, datagen.relation_pairs_df(spark))
    got = {
        (r["entity"], r["property"], r["property_value"])
        for r in out.collect()
    }
    # registered pairs: (CHEM,PROT), (CHEM,DIS), (DIS,PROT) — ordered
    assert got == {
        ("Glucose", DIFF, "ACE2"),
        ("Glucose", DIFF, "Malaria"),
        ("Malaria", DIFF, "ACE2"),
    }


def test_relation_same_letter_positive(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", "id1", 0, 0, "S", 0, 7, "Aspirin", "CHEMICAL"),
            ("u1", "id1", 0, 0, "S", 20, 24, "ACE2", "PROTEIN"),
        ],
        ["url", "uid", "ppos", "spos", "section",
         "start_char", "end_char", "mention", "entity_type"],
    )
    out = relation_stage(mentions, datagen.relation_pairs_df(spark)).collect()
    assert len(out) == 1 and out[0]["property"] == SAME


def test_mention_cap_bounds_pair_blowup(spark):
    rows = [
        ("u1", "id1", 0, 0, "S", i * 10, i * 10 + 7, f"Chem{i}", "CHEMICAL")
        for i in range(10)
    ] + [
        ("u1", "id1", 0, 0, "S", 500, 504, "ACE2", "PROTEIN"),
    ]
    mentions = spark.createDataFrame(
        rows,
        ["url", "uid", "ppos", "spos", "section",
         "start_char", "end_char", "mention", "entity_type"],
    )
    out = relation_stage(
        mentions, datagen.relation_pairs_df(spark), max_per_sentence=3
    )
    # cap keeps the first 3 mentions by offset: Chem0, Chem1, Chem2 — and
    # drops ACE2 (offset 500), so only CHEMICAL→PROTEIN pairs vanish
    assert out.count() == 0


# --- linking ------------------------------------------------------------------

def test_hash_embed_deterministic_unit_norm():
    a = hash_embed("glucose", 64)
    b = hash_embed("glucose", 64)
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9
    assert hash_embed("insulin", 64) != a


def test_cosine_col(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"]
    )
    got = [r["c"] for r in df.select(cosine_col("a", "b").alias("c")).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)


def test_link_stage_exact_and_knn(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", "id1", 0, 0, "S", 0, 7, "Glucose", "CHEMICAL"),
            ("u1", "id1", 0, 0, "S", 10, 18, "dextrose", "CHEMICAL"),
        ],
        ["url", "uid", "ppos", "spos", "section",
         "start_char", "end_char", "mention", "entity_type"],
    )
    out = link_stage(mentions, datagen.concepts_df(spark))
    got = {r["mention"]: r["concept_id"] for r in out.collect()}
    assert got == {"Glucose": "C:GLUCOSE", "dextrose": "C:GLUCOSE"}


def test_link_stage_knn_fallback_is_deterministic(spark):
    mentions = spark.createDataFrame(
        [("u1", "id1", 0, 0, "S", 0, 5, "zzz-unknown-form", "CHEMICAL")],
        ["url", "uid", "ppos", "spos", "section",
         "start_char", "end_char", "mention", "entity_type"],
    )
    out1 = link_stage(mentions, datagen.concepts_df(spark)).collect()
    out2 = link_stage(mentions, datagen.concepts_df(spark)).collect()
    assert out1[0]["concept_id"] == out2[0]["concept_id"]
    assert out1[0]["link_score"] == out2[0]["link_score"]


# --- connected components -----------------------------------------------------

def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"),  # chain a-b-c-d
         ("x", "y"),                            # pair
         ("q", "q2")],                          # pair
        ["src", "dst"],
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x",
        "q": "q", "q2": "q",
    }


def test_connected_components_star_merge(spark):
    # two concepts sharing an alias → one component
    edges = spark.createDataFrame(
        [("glucose", "C:GLUCOSE"), ("d-glucose", "C:GLUCOSE"),
         ("d-glucose", "C:DEXTROSE")],
        ["src", "dst"],
    )
    got = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    assert set(got.values()) == {"C:DEXTROSE"}


# --- evaluation ----------------------------------------------------------------

def test_entity_level_pr_matches_reference_formulas(spark):
    cols = ["url", "ppos", "spos", "start_char", "end_char", "entity_type"]
    truth = spark.createDataFrame(
        [("u", 0, 0, 0, 5, "CHEMICAL"),
         ("u", 0, 0, 10, 15, "CHEMICAL"),
         ("u", 0, 1, 0, 4, "DISEASE")],
        cols,
    )
    pred = spark.createDataFrame(
        [("u", 0, 0, 0, 5, "CHEMICAL"),      # TP
         ("u", 0, 0, 11, 15, "CHEMICAL"),    # FP (offset off by one)
         ("u", 0, 1, 0, 4, "DISEASE"),       # TP
         ("u", 0, 1, 6, 9, "DISEASE")],      # FP
        cols,
    )
    rep = {
        r["entity_type"]: r for r in entity_level_pr(truth, pred).collect()
    }
    chem = rep["CHEMICAL"]
    assert (chem["tp"], chem["n_true"], chem["n_pred"]) == (1, 2, 2)
    assert chem["precision"] == pytest.approx(0.5)
    assert chem["recall"] == pytest.approx(0.5)
    dis = rep["DISEASE"]
    assert dis["precision"] == pytest.approx(0.5)
    assert dis["recall"] == pytest.approx(1.0)
    assert dis["f1"] == pytest.approx(2 * 1 / (2 + 1))


def test_ner_stage_multi_model_registry(spark):
    """Per-entity-type model registry (ner_stage_multi): the fused pass
    equals the union of single-model passes, and a model's spans outside
    its own entity type are validated away."""
    from search_spark import datagen
    from search_spark.extraction.extract import extract_stage
    from search_spark.operators.ner import ner_stage, ner_stage_multi
    from search_spark.operators.segment import segment_stage

    pages = datagen.generate_web_pages(spark, 15, seed=42)
    sentences = segment_stage(extract_stage(pages)).cache()
    per_type = {
        etype: [(t, etype) for t in terms]
        for etype, terms in datagen.GAZETTEER.items()
        if etype in ("CHEMICAL", "DISEASE")
    }
    # one model deliberately mislabels: a DISEASE pattern inside the
    # CHEMICAL model must be dropped by the type-consistency validation
    per_type["CHEMICAL"] = per_type["CHEMICAL"] + [("Influenza", "DISEASE")]

    fused = ner_stage_multi(sentences, per_type)
    cols = ["url", "ppos", "spos", "start_char", "end_char", "mention",
            "entity_type"]
    got = {tuple(r) for r in fused.select(*cols).collect()}

    expected = set()
    for etype in ("CHEMICAL", "DISEASE"):
        single = ner_stage(
            sentences, [(t, etype) for t in datagen.GAZETTEER[etype]]
        )
        expected |= {tuple(r) for r in single.select(*cols).collect()}
    sentences.unpersist()
    assert got == expected
    assert any(r[-1] == "CHEMICAL" for r in got)
    assert any(r[-1] == "DISEASE" for r in got)


def test_pipeline_with_model_registry(spark):
    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, build_triples

    pages = datagen.generate_web_pages(spark, 10, seed=42)
    models = {
        etype: [(t, etype) for t in terms]
        for etype, terms in datagen.GAZETTEER.items()
    }
    via_registry = build_triples(
        spark, pages, PipelineConfig(models=models)
    )
    flat = build_triples(spark, pages, PipelineConfig())
    cols = ["subj", "pred", "obj", "prov"]
    assert {tuple(r) for r in via_registry.select(*cols).collect()} == {
        tuple(r) for r in flat.select(*cols).collect()
    }


def test_segment_reassembly_roundtrip(spark):
    """Paragraph reassembly (sql.py:253-291: group by (article, ppos),
    order by spos, join with spaces) must invert the segmenter exactly on
    the synthetic corpus — the ordered-group-concat correctness invariant."""
    from pyspark.sql import functions as F

    from search_spark import datagen
    from search_spark.extraction.extract import extract_stage
    from search_spark.operators.segment import segment_stage

    pages = datagen.generate_web_pages(spark, 20, seed=42)
    paragraphs = extract_stage(pages).cache()
    sentences = segment_stage(paragraphs)
    reassembled = sentences.groupBy("url", "ppos").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("spos", "text"))),
                lambda x: x["text"],
            ),
            " ",
        ).alias("re_text")
    )
    joined = paragraphs.join(reassembled, on=["url", "ppos"])
    n_total = joined.count()
    n_bad = joined.filter(F.col("text") != F.col("re_text")).count()
    paragraphs.unpersist()
    assert n_total > 0
    assert n_bad == 0


def test_canonical_url_collapses_variants(spark):
    from search_spark.operators.urls import canonical_url_col
    from pyspark.sql import functions as F

    variants = [
        "https://www.example.org/a/b",
        "HTTPS://WWW.EXAMPLE.ORG/a/b/",
        "http://example.org/a/b#section-2",
        "https://example.org/a/b?utm_source=feed",
        "https://example.org/a/b?utm_source=x&utm_medium=y",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    got = {
        r["c"]
        for r in df.select(canonical_url_col("url").alias("c")).collect()
    }
    assert got == {"example.org/a/b"}
    # non-tracking params survive, in place
    keep = spark.createDataFrame(
        [("https://example.org/s?utm_campaign=z&q=spark&page=2",)], ["url"]
    )
    assert keep.select(canonical_url_col("url").alias("c")).collect()[0][
        "c"
    ] == "example.org/s?q=spark&page=2"
