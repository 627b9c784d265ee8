"""End-to-end pipeline test: synthetic corpus → triples, gated at P/R ≥ 0.95.

The expected triples are computed *independently* in plain Python from the
datagen ground truth (``ExpectedDoc``) — the same role the reference's
``run_pipeline`` output plays as oracle (SURVEY.md §5) — then compared with
the exact-match triple P/R job (``triple_level_pr``). On this deterministic
corpus the pipeline must hit P = R = 1.0; the BASELINE gate is ≥ 0.95.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from search_spark import datagen
from search_spark.operators.evaluation import triple_level_pr
from search_spark.operators.relations import DIFF, SAME
from search_spark.pipeline import PipelineConfig, build_triples

N_DOCS = 120
SEED = 42


def _canonical_map() -> dict[str, str]:
    """form(lower) → canonical id, computed independently of the pipeline."""
    # exact alias linking
    form_to_concept = {}
    for cid, aliases in datagen.CONCEPT_ALIASES.items():
        for a in aliases:
            form_to_concept[a.lower()] = cid
    # union-find over (form—concept) and shared-alias concept edges
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # lexicographic min becomes the representative
            lo, hi = sorted([ra, rb])
            parent[hi] = lo

    for form, cid in form_to_concept.items():
        union(form, cid)
    return {
        form: find(form) for form in form_to_concept
    }


def _expected_triples() -> set[tuple]:
    canon = _canonical_map()
    rel_pairs = set(datagen.RELATION_PAIRS)
    triples: set[tuple] = set()
    for doc_id in range(N_DOCS):
        row, exp = datagen.generate_doc(SEED, doc_id)
        if row["lang"] != "en":
            continue
        uid = hashlib.md5(row["url"].encode()).hexdigest()
        sections = {p: s for p, s, _ in exp.paragraphs}
        # group mentions by sentence
        by_sentence: dict[tuple, list] = {}
        for ppos, spos, start, end, term, etype in exp.mentions:
            if etype == "NaE":
                continue
            by_sentence.setdefault((ppos, spos), []).append(
                (start, end, term, etype)
            )
        for (ppos, spos), ments in by_sentence.items():
            prov = f"{uid}:{sections[ppos]}:{ppos}"
            for start, end, term, etype in ments:
                subj = canon.get(term.lower(), term)
                triples.add((subj, "has_type", etype, prov))
                for start2, end2, term2, etype2 in ments:
                    if (start, end) == (start2, end2):
                        continue
                    if (etype, etype2) in rel_pairs:
                        pred = (
                            SAME
                            if term[0].lower() == term2[0].lower()
                            else DIFF
                        )
                        obj = canon.get(term2.lower(), term2)
                        triples.add((subj, pred, obj, prov))
    return triples


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
