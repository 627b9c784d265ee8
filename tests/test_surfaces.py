"""Serving-surface tests: mining-on-demand, compute_embeddings, search."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_spark import datagen, surfaces
from search_spark.extraction.extract import extract_stage
from search_spark.operators.segment import segment_stage
from search_spark.operators.triples import SPECS


def test_mine_texts_returns_specs_rows(spark):
    # mirrors the reference's fixture contract: known text → known entity
    # and relation rows (tests/unit/mining/test_pipeline.py:31-165)
    df = surfaces.mine_texts(
        spark,
        [
            "Glucose rises in Diabetes all the time.",
            "Nothing to see here.",
        ],
    )
    assert df.columns == SPECS
    rows = df.collect()
    ents = {
        (r["entity"], r["entity_type"])
        for r in rows
        if r["property"] is None
    }
    assert ents == {("Glucose", "CHEMICAL"), ("Diabetes", "DISEASE")}
    rels = {
        (r["entity"], r["property"], r["property_value"])
        for r in rows
        if r["property"] is not None
    }
    # CHEMICAL→DISEASE has a registered model; G vs D start differently
    assert rels == {
        ("Glucose", "START_WITH_DIFFERENT_LETTER", "Diabetes")
    }
    assert all(r["paper_id"].startswith("text://0") for r in rows)


def test_compute_embeddings_and_search_roundtrip(spark):
    pages = datagen.generate_web_pages(spark, 12, seed=17, partitions=2)
    sentences = segment_stage(extract_stage(pages)).filter(~F.col("is_bad"))
    embedded = surfaces.compute_embeddings(sentences).cache()
    assert "embedding" in embedded.columns
    assert len(embedded.first()["embedding"]) == 64

    # searching for a sentence's own text must rank that sentence first
    # (hash-embeddings are exact for identical token multisets)
    target = embedded.orderBy("url", "ppos", "spos").first()
    hits = surfaces.search_sentences(embedded, target["text"], k=3).collect()
    assert hits[0]["text"] == target["text"]
    assert hits[0]["score"] == 1.0

    # deprioritizing the target's own text pushes it off the top
    hits2 = surfaces.search_sentences(
        embedded,
        target["text"],
        k=3,
        deprioritize_text=target["text"],
        strength="Stronger",
    ).collect()
    assert hits2[0]["text"] != target["text"]
    embedded.unpersist()


def test_search_articles_ranks_by_best_sentence(spark):
    pages = datagen.generate_web_pages(spark, 10, seed=23, partitions=2)
    sentences = segment_stage(extract_stage(pages)).filter(~F.col("is_bad"))
    embedded = surfaces.compute_embeddings(sentences).cache()
    target = embedded.orderBy("url", "ppos", "spos").first()
    hits = surfaces.search_articles(embedded, target["text"], k_articles=3)
    rows = hits.collect()
    assert rows[0]["url"] == target["url"]
    assert rows[0]["best_score"] == 1.0
    assert rows[0]["best_sentence"] == target["text"]
    # distinct articles, descending scores
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls)
    scores = [r["best_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    embedded.unpersist()


def test_cli_mine_subcommand(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/cli.py", "mine",
         "--text", "Insulin helps Diabetes."],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l]
    assert lines[0].startswith("entity,entity_type,property")
    assert any(l.startswith("Insulin,CHEMICAL") for l in lines)
