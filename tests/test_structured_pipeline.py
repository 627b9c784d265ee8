"""E2E: structured sources (web tables, JSON-LD, microdata, meta tags)
fused into the pipeline."""

from pyspark.sql import functions as F

from search_spark.pipeline import PipelineConfig, build_triples


def _page(spark):
    html = (
        '<html><head><script type="application/ld+json">'
        '{"@type": "Drug", "@id": "drug:glc", "name": "Glucose", '
        '"dosage": "5mg"}</script>'
        '<meta property="og:title" content="Glucose page"></head>'
        "<body><h2>S</h2><p>Glucose level rises in Diabetes patients.</p>"
        "<table><tr><th>item</th><th>class</th></tr>"
        "<tr><td>Glucose</td><td>sugar</td></tr></table>"
        '<div itemscope itemtype="https://schema.org/Drug">'
        '<span itemprop="alternateName">Dextrose</span></div>'
        "</body></html>"
    )
    return spark.createDataFrame(
        [("https://x.org/p1", html.encode(), "en")],
        schema="url string, html binary, lang string",
    )


def test_structured_sources_are_additive(spark):
    pages = _page(spark)
    base = build_triples(spark, pages, PipelineConfig())
    fused = build_triples(
        spark, pages, PipelineConfig(structured_sources=True)
    )
    key = ["subj", "pred", "obj", "prov"]
    base_rows = {tuple(r) for r in base.select(key).collect()}
    fused_rows = {tuple(r) for r in fused.select(key).collect()}
    # text-path triples unchanged, structured rows strictly added
    assert base_rows <= fused_rows
    added = fused.join(base.select(key), on=key, how="left_anti")
    tags = {r.ontology_source for r in added.select("ontology_source").collect()}
    assert tags == {"webtable", "jsonld", "microdata", "meta"}
    # structured rows carry the page url and NULL NER-only columns
    s = added.filter(F.col("ontology_source") == "webtable").collect()
    assert s and all(r.url == "https://x.org/p1" for r in s)
    assert all(r.entity_type is None for r in s)
    got = {(r.subj, r.pred, r.obj) for r in added.collect()}
    assert ("Glucose", "class", "sugar") in got
    assert ("drug:glc", "dosage", "5mg") in got
    assert ("drug:glc", "rdf:type", "Drug") in got
    assert ("https://x.org/p1#item0", "alternateName", "Dextrose") in got
    assert ("https://x.org/p1", "og:title", "Glucose page") in got


def test_structured_off_by_default_schema_stable(spark):
    pages = _page(spark)
    base = build_triples(spark, pages, PipelineConfig())
    assert "ontology_source" in base.columns
    assert {r.ontology_source for r in base.collect()} & {
        "webtable",
        "jsonld",
        "microdata",
        "meta",
    } == set()


def test_run_to_snapshot_with_structured_sources_resumes(spark, tmp_path):
    from search_spark.pipeline import run_to_snapshot

    root = str(tmp_path / "snap")
    cfg = PipelineConfig(structured_sources=True)
    m1 = run_to_snapshot(spark, _page(spark), root, cfg)
    assert m1["n_docs"] == 1 and m1["n_triples"] > 0
    # structured rows landed in the snapshot with their tags
    written = spark.read.option("basePath", f"{root}/data").parquet(
        f"{root}/data"
    )
    tags = {
        r.ontology_source
        for r in written.select("ontology_source").distinct().collect()
    }
    assert {"webtable", "jsonld", "microdata", "meta"} <= tags
    # second run over the same corpus is a pure resume
    m2 = run_to_snapshot(spark, _page(spark), root, cfg)
    assert m2 == {"resumed": True, "n_docs": 0, "n_triples": 0}
