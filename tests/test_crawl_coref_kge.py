"""Crawl-scheduling, coreference, and KG-embedding-scoring operators:
behavior plus the plan properties their 10^12-row story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import SF_DIR, plan_of


def _rows(df):
    return {tuple(r) for r in df.collect()}


# -- robots ------------------------------------------------------------------

def test_robots_longest_prefix_and_allow_override(spark):
    from search_spark.operators.crawl import robots_allowed

    robots = spark.createDataFrame(
        [
            (
                "https://h.example/robots.txt",
                b"User-agent: *\nDisallow: /private/\n"
                b"Allow: /private/pub/\nDisallow:\n",
            )
        ],
        schema="url string, html binary",
    )
    cand = spark.createDataFrame(
        [
            ("https://h.example/private/a",),       # blocked
            ("https://h.example/private/pub/b",),   # re-allowed (longer)
            ("https://h.example/open/c",),          # no rule matches
            ("https://other.example/private/a",),   # host without robots
        ],
        schema="url string",
    )
    got = _rows(robots_allowed(cand, robots))
    assert got == {
        ("https://h.example/private/pub/b", "/private/pub/"),
        ("https://h.example/open/c", None),
        ("https://other.example/private/a", None),
    }


def test_robots_user_agent_groups(spark):
    from search_spark.operators.crawl import robots_allowed

    robots = spark.createDataFrame(
        [
            (
                "https://h.example/robots.txt",
                # pre-group rule (no User-agent yet): ignored;
                # specialbot-only Disallow-all: not for us;
                # multi-header group that includes *: applies
                b"Disallow: /pregroup/\n"
                b"User-agent: specialbot\nDisallow: /\n\n"
                b"User-agent: a\nUser-agent: *\nDisallow: /private/\n",
            )
        ],
        schema="url string, html binary",
    )
    cand = spark.createDataFrame(
        [
            ("https://h.example/pregroup/x",),
            ("https://h.example/anything",),
            ("https://h.example/private/a",),
        ],
        schema="url string",
    )
    got = _rows(robots_allowed(cand, robots))
    assert got == {
        ("https://h.example/pregroup/x", None),
        ("https://h.example/anything", None),
    }


def test_robots_rules_join_is_broadcast(spark):
    from search_spark import oracles
    from search_spark.operators.crawl import robots_allowed

    robots = spark.createDataFrame(
        oracles.robots_fixture_pages(), schema="url string, html binary"
    )
    cand = spark.createDataFrame(
        oracles.robots_candidate_rows(), schema="url string"
    )
    plan = plan_of(robots_allowed(cand, robots))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# -- sitemap -----------------------------------------------------------------

def test_sitemap_frontier_reasons(spark):
    from search_spark.operators.crawl import sitemap_frontier

    sitemaps = spark.createDataFrame(
        [
            (
                "https://s.example/sitemap.xml",
                b'<urlset><url><loc>https://s.example/new</loc></url>'
                b"<url><loc>https://s.example/stale</loc>"
                b"<lastmod>2026-02-01</lastmod>"
                b"<priority>0.9</priority></url>"
                b"<url><loc>https://s.example/fresh</loc>"
                b"<lastmod>2026-01-01</lastmod></url></urlset>",
            )
        ],
        schema="url string, html binary",
    )
    crawled = spark.createDataFrame(
        [
            ("https://s.example/stale", "2026-01-15 00:00:00"),
            ("https://s.example/fresh", "2026-01-20 00:00:00"),
        ],
        schema="url string, warc_ts string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    got = _rows(sitemap_frontier(sitemaps, crawled))
    assert got == {
        ("https://s.example/new", 0.5, "new"),
        ("https://s.example/stale", 0.9, "stale"),
    }


def test_sitemap_parse_handles_multiline_records(spark):
    from search_spark.operators.crawl import sitemap_entries

    xml = (
        b'<?xml version="1.0"?>\n<urlset>\n'
        b" <url>\n  <loc>https://s.example/a</loc>\n"
        b"  <priority>0.9</priority>\n </url>\n"
        b" <url><loc>https://s.example/b</loc></url>\n</urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("https://s.example/sitemap.xml", xml)],
        schema="url string, html binary",
    )
    got = {
        (r.loc, r.priority)
        for r in sitemap_entries(sitemaps).collect()
    }
    assert got == {
        ("https://s.example/a", 0.9),
        ("https://s.example/b", 0.5),
    }


def test_sitemap_parse_is_pure_codegen(spark):
    from search_spark import oracles
    from search_spark.operators.crawl import sitemap_entries

    sitemaps = spark.createDataFrame(
        oracles.sitemap_fixture_pages(), schema="url string, html binary"
    )
    plan = plan_of(sitemap_entries(sitemaps))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- coref -------------------------------------------------------------------

def test_coref_number_agreement_and_drop(spark):
    from search_spark.operators.coref import resolve_pronouns

    sentences = spark.createDataFrame(
        [
            (1, 0, "It starts unresolved."),
            (1, 1, "Alice founded Acme."),
            (1, 2, "She grew it with the Ants."),
            (1, 3, "They hired Bob."),
        ],
        schema="doc_id int, sent_pos int, text string",
    )
    mentions = spark.createDataFrame(
        [
            (1, 1, 0, "Alice", False),
            (1, 1, 2, "Acme", False),
            (1, 2, 5, "Ants", True),
            (1, 3, 2, "Bob", False),
        ],
        schema="doc_id int, sent_pos int, tok_pos int, entity string,"
        " is_plural boolean",
    )
    got = _rows(resolve_pronouns(sentences, mentions))
    # sentence-0 "it" has no antecedent -> dropped; "she"/"it" -> nearest
    # singular (Acme, after the mention at tok 2 of sent 1); "they" -> Ants
    assert got == {
        (1, 2, 0, "she", "Acme"),
        (1, 2, 2, "it", "Acme"),
        (1, 3, 0, "they", "Ants"),
    }


def test_coref_single_doc_shuffle(spark):
    from search_spark import oracles
    from search_spark.operators.coref import resolve_pronouns

    sents, ments = oracles.coref_fixture()
    sentences = spark.createDataFrame(
        sents, schema="doc_id int, sent_pos int, text string"
    )
    mentions = spark.createDataFrame(
        ments,
        schema="doc_id int, sent_pos int, tok_pos int, entity string,"
        " is_plural boolean",
    )
    plan = plan_of(resolve_pronouns(sentences, mentions))
    # the window and the mention join share the doc-grained partitioning;
    # no Python operator anywhere
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- kge ---------------------------------------------------------------------

def test_transe_energy_identity(spark):
    from search_spark.operators.kge import embed, transe_energy

    df = spark.range(1).select(
        transe_energy(
            embed(F.lit("a")), embed(F.lit("zero")), embed(F.lit("a"))
        ).alias("e_self"),
    )
    # h + r - t with h == t leaves Σ|r_i| = the digit sum of md5('zero')
    import hashlib

    digits = [int(c, 16) for c in hashlib.md5(b"zero").hexdigest()[:16]]
    assert df.collect()[0].e_self == sum(digits)


def test_rank_tails_true_tail_rank_one_when_best(spark):
    from search_spark.operators.kge import rank_tails, score_triples

    triples = spark.createDataFrame(
        [("s", "p", "o1")], schema="subj string, pred string, obj string"
    )
    cands = spark.createDataFrame(
        [("o1",), ("o2",), ("o3",), ("o4",)], schema="entity string"
    )
    row = rank_tails(triples, cands).collect()[0]
    assert row.n_candidates == 3  # true tail excluded
    # recompute expected rank from the scored corruptions
    energies = {
        r.obj: r.energy
        for r in score_triples(
            spark.createDataFrame(
                [("s", "p", c) for c in ("o1", "o2", "o3", "o4")],
                schema="subj string, pred string, obj string",
            )
        ).collect()
    }
    e_true = energies.pop("o1")
    expected = 1 + sum(
        1
        for c, e in energies.items()
        if e < e_true or (e == e_true and c < "o1")
    )
    assert row.rank == expected


def test_distmult_score_matches_python(spark):
    from search_spark.operators.kge import distmult_score, embed

    df = spark.range(1).select(
        distmult_score(
            embed(F.lit("h")), embed(F.lit("r")), embed(F.lit("t"))
        ).alias("s"),
    )
    import hashlib

    def digits(s):
        return [int(c, 16) for c in hashlib.md5(s).hexdigest()[:16]]

    expected = sum(
        a * b * c for a, b, c in zip(digits(b"h"), digits(b"r"), digits(b"t"))
    )
    assert df.collect()[0].s == expected


def test_rank_tails_model_hook_distmult_higher_is_better(spark):
    """The same ranking machinery serves both MODELS entries; DistMult
    ranks by descending score (strictly-greater beats), TransE by
    ascending energy — verified against a Python recompute."""
    from search_spark.operators.kge import MODELS, embed, rank_tails

    triples = spark.createDataFrame(
        [("s", "p", "o1"), ("s2", "q", "o3")],
        schema="subj string, pred string, obj string",
    )
    cands = spark.createDataFrame(
        [("o1",), ("o2",), ("o3",), ("o4",)], schema="entity string"
    )
    import hashlib

    def digits(s):
        return [int(c, 16) for c in hashlib.md5(s.encode()).hexdigest()[:16]]

    def dm(h, r, t):
        return sum(
            a * b * c for a, b, c in zip(digits(h), digits(r), digits(t))
        )

    rows = {
        (r.subj, r.pred, r.obj): r
        for r in rank_tails(triples, cands, model="distmult").collect()
    }
    for (s, p, o), row in rows.items():
        true_score = dm(s, p, o)
        assert row.energy == true_score
        expected = 1 + sum(
            1
            for c in ("o1", "o2", "o3", "o4")
            if c != o
            and (
                dm(s, p, c) > true_score
                or (dm(s, p, c) == true_score and c < o)
            )
        )
        assert row.rank == expected, (s, p, o)
    assert set(MODELS) == {"transe", "distmult", "complex"}


def test_complex_score_matches_python(spark):
    """ComplEx over packed re‖im md5-digit embeddings vs a direct
    complex-arithmetic recompute: Re(Σ h·r·conj(t))."""
    from search_spark.operators.kge import complex_score, embed

    df = spark.range(1).select(
        complex_score(
            embed(F.lit("h"), 32),
            embed(F.lit("r"), 32),
            embed(F.lit("t"), 32),
        ).alias("s"),
    )
    import hashlib

    def cdig(s):
        d = [int(c, 16) for c in hashlib.md5(s).hexdigest()]
        return [complex(re, im) for re, im in zip(d[:16], d[16:32])]

    expected = sum(
        (a * b * c.conjugate()).real
        for a, b, c in zip(cdig(b"h"), cdig(b"r"), cdig(b"t"))
    )
    assert df.collect()[0].s == int(expected)


def test_rank_tails_candidate_join_is_broadcast(spark):
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["kg_transe_rank"].spark(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sitemap_malformed_fields_degrade_not_throw(spark):
    from search_spark.operators.crawl import sitemap_entries

    sitemaps = spark.createDataFrame(
        [
            (
                "https://m.example/sitemap.xml",
                b"<urlset><url><loc>https://m.example/ok</loc>"
                b"<lastmod>not-a-date</lastmod>"
                b"<priority>high</priority></url></urlset>",
            )
        ],
        schema="url string, html binary",
    )
    rows = sitemap_entries(sitemaps).collect()
    # ANSI mode must not abort: malformed lastmod -> NULL (never stale),
    # malformed priority -> protocol default
    assert len(rows) == 1
    assert rows[0].lastmod is None
    assert rows[0].priority == 0.5


def test_cli_crawl_subcommand(spark, tmp_path):
    import subprocess
    import sys

    from search_spark import oracles

    spark.createDataFrame(
        oracles.sitemap_fixture_pages(), schema="url string, html binary"
    ).write.parquet(str(tmp_path / "sitemaps"))
    spark.createDataFrame(
        oracles.sitemap_crawled_rows(), schema="url string, warc_ts string"
    ).selectExpr("url", "CAST(warc_ts AS TIMESTAMP) AS warc_ts").write.parquet(
        str(tmp_path / "crawled")
    )
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "crawl",
         "--sitemaps", str(tmp_path / "sitemaps"),
         "--crawled", str(tmp_path / "crawled"),
         "--delay", "0.5", "--max-per-host", "5"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l]
    assert lines[0] == "loc,host,slot,fetch_offset_s"
    # 4 hosts x 5-slot cap
    assert len(lines) == 1 + 20


def test_ranking_metrics_known_ranks(spark):
    from search_spark.operators.kge import ranking_metrics

    df = spark.createDataFrame([(r,) for r in (1, 2, 10, 20)], "rank int")
    m = ranking_metrics(df).collect()[0]
    assert m.mrr == round((1 + 0.5 + 0.1 + 0.05) / 4, 6)
    assert m.hits_at_1 == 0.25
    assert m.hits_at_3 == 0.5
    assert m.hits_at_10 == 0.75
    assert m.mean_rank == 8.25
    assert m.n_triples == 4
