"""End-to-end crawl loop: sitemap frontier → (simulated) fetch → KG
snapshot → recrawl wave sees only the delta.

Ties the ingest-side operators (operators/crawl.py) to the resumable
pipeline (pipeline.run_to_snapshot): the frontier drives which pages enter
the corpus, the capture table grows with each wave, and the snapshot's
anti-join resume guarantees wave 2 mines only wave-2 urls.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _sitemap_df(spark, urls_with_lastmod):
    recs = "".join(
        f"<url><loc>{u}</loc><lastmod>{lm}</lastmod></url>"
        for u, lm in urls_with_lastmod
    )
    xml = f'<?xml version="1.0"?><urlset>{recs}</urlset>'
    return spark.createDataFrame(
        [("https://loop.example/sitemap.xml", xml.encode())],
        schema="url string, html binary",
    )


def test_crawl_loop_frontier_drives_incremental_snapshot(spark, tmp_path):
    from search_spark import datagen, pipeline
    from search_spark.operators.crawl import sitemap_frontier

    root = str(tmp_path / "kg")
    # a pool of fetchable pages, keyed by url
    pages = datagen.generate_web_pages(spark, 12, seed=11).localCheckpoint(
        eager=True
    )
    all_urls = [r.url for r in pages.select("url").collect()]

    # wave 1: sitemap lists the first 8 urls; nothing crawled yet
    sm1 = _sitemap_df(spark, [(u, "2026-01-10") for u in all_urls[:8]])
    crawled0 = spark.createDataFrame(
        [], schema="url string, warc_ts timestamp"
    )
    f1 = sitemap_frontier(sm1, crawled0)
    assert f1.count() == 8
    assert {r.reason for r in f1.collect()} == {"new"}

    wave1 = pages.join(
        f1.select(F.col("loc").alias("url")), "url", "left_semi"
    )
    r1 = pipeline.run_to_snapshot(spark, wave1, root)
    assert r1["n_docs"] == 8

    # wave 2: sitemap adds 4 new urls and bumps lastmod on one old url
    captures = wave1.select(
        "url", F.lit("2026-01-15 00:00:00").cast("timestamp").alias(
            "warc_ts"
        )
    )
    sm2 = _sitemap_df(
        spark,
        [(u, "2026-01-10") for u in all_urls[:7]]
        + [(all_urls[7], "2026-01-20")]  # stale -> recrawl
        + [(u, "2026-01-10") for u in all_urls[8:]],
    )
    f2 = sitemap_frontier(sm2, captures)
    reasons = {r.loc: r.reason for r in f2.collect()}
    assert reasons[all_urls[7]] == "stale"
    assert sum(1 for v in reasons.values() if v == "new") == 4
    assert len(reasons) == 5  # 4 new + 1 stale; fresh urls absent

    # fetch wave 2 and extend the snapshot: resume mines ONLY the 4 new
    # urls (the stale one re-enters the corpus but its url is already in
    # the processed set — redo_entity_type / delete_where is the refresh
    # path for changed content, exercised in test_redo.py)
    wave2 = pages.join(
        f2.select(F.col("loc").alias("url")), "url", "left_semi"
    )
    r2 = pipeline.run_to_snapshot(
        spark, wave1.unionByName(wave2).distinct(), root
    )
    assert r2["resumed"] is True
    assert r2["n_docs"] == 4
