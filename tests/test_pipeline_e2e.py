"""End-to-end pipeline test: synthetic corpus → triples, gated at P/R ≥ 0.95.

The expected triples are computed *independently* in plain Python from the
datagen ground truth (``ExpectedDoc``) — the same role the reference's
``run_pipeline`` output plays as oracle (SURVEY.md §5) — then compared with
the exact-match triple P/R job (``triple_level_pr``). On this deterministic
corpus the pipeline must hit P = R = 1.0; the BASELINE gate is ≥ 0.95.
"""

import pytest
from pyspark.sql import functions as F

from search_spark import datagen
from search_spark.operators.evaluation import triple_level_pr
from search_spark.oracles import kg_triples_expected
from search_spark.pipeline import PipelineConfig, build_triples

N_DOCS = 120
SEED = 42


def _expected_triples() -> set[tuple]:
    # shared with the driver-facing VALUES oracle (oracles.py) — pure-Python
    # union-find over datagen ground truth, independent of the pipeline
    return kg_triples_expected(N_DOCS, SEED)


@pytest.fixture(scope="module")
def triples_df(spark):
    pages = datagen.generate_web_pages(spark, N_DOCS, seed=SEED, partitions=4)
    df = build_triples(spark, pages, PipelineConfig()).cache()
    df.count()
    yield df
    df.unpersist()


def test_triple_pr_gate(spark, triples_df):
    expected = _expected_triples()
    assert len(expected) > 200, "fixture corpus too small to be meaningful"
    truth = spark.createDataFrame(
        [t for t in expected], ["subj", "pred", "obj", "prov"]
    )
    report = triple_level_pr(truth, triples_df)
    assert report["precision"] >= 0.95, report
    assert report["recall"] >= 0.95, report
    # deterministic corpus + deterministic pipeline → exact parity
    assert report["precision"] == 1.0, report
    assert report["recall"] == 1.0, report


def test_triples_have_canonical_subjects(triples_df):
    rows = triples_df.filter(
        (F.col("pred") == "has_type") & (F.col("entity_type") == "CHEMICAL")
    ).select("subj").distinct().collect()
    subjects = {r["subj"] for r in rows}
    assert subjects <= {
        "C:GLUCOSE", "C:INSULIN", "C:CYTARABINE", "C:ASPIRIN", "C:DOPAMINE"
    }, subjects


def test_ontology_source_joined(triples_df):
    src = {
        r["entity_type"]: r["ontology_source"]
        for r in triples_df.select("entity_type", "ontology_source")
        .distinct()
        .collect()
        if r["entity_type"] is not None
    }
    assert src["PROTEIN"] == "UNIPROT"
    assert src["ORGANISM"] == "NCBITAXON"


def test_non_english_pages_excluded(spark, triples_df):
    non_en_urls = {
        datagen.generate_doc(SEED, i)[0]["url"]
        for i in range(N_DOCS)
        if datagen.generate_doc(SEED, i)[0]["lang"] != "en"
    }
    assert non_en_urls, "fixture should contain non-english docs"
    got = {
        r["url"] for r in triples_df.select("url").distinct().collect()
    }
    assert not (got & non_en_urls)
