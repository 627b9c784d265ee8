"""Webtable column annotation, IFP sameAs, RAKE keywords, degree
histogram — behavior edges beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import SF_DIR, plan_of


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_ifp_purge_drops_hot_key(spark):
    from search_spark.operators.blocking import ifp_candidates

    triples = spark.createDataFrame(
        [
            ("r1", "email", "x@e"),
            ("r2", "email", "x@e"),
            ("r1", "homepage", "hub"),
            ("r2", "homepage", "hub"),
            ("r3", "homepage", "hub"),
            ("r1", "name", "n"),  # not inverse-functional
            ("r2", "name", "n"),
            ("r4", "email", ""),  # empty obj ignored
            ("r5", "email", ""),
        ],
        schema="subj string, pred string, obj string",
    )
    got = _rows(
        ifp_candidates(triples, ["email", "homepage"], max_group=2)
    )
    # homepage group size 3 > max_group -> purged; name not IFP; '' ignored
    assert got == {("r1", "r2", "email", "x@e")}


def test_column_types_datatypes_and_majority(spark):
    from search_spark.operators.webtables import column_types

    cells = spark.createDataFrame(
        [
            # header
            ("u", 0, 0, 0, True, "n"),
            ("u", 0, 0, 1, True, "mixed"),
            # column 0: all integers; column 1: 2/3 colors (majority)
            ("u", 0, 1, 0, False, "1"),
            ("u", 0, 1, 1, False, "red"),
            ("u", 0, 2, 0, False, "-7"),
            ("u", 0, 2, 1, False, "blue"),
            ("u", 0, 3, 0, False, "12"),
            ("u", 0, 3, 1, False, "3.5"),
        ],
        schema="url string, t_idx int, r_idx int, c_idx int,"
        " is_header boolean, text string",
    )
    vocab = spark.createDataFrame(
        [("red", "COLOR"), ("blue", "COLOR")],
        schema="value string, sem_type string",
    )
    got = _rows(column_types(cells, vocab))
    assert got == {
        ("u", 0, 0, "n", 3, "integer", None),
        ("u", 0, 1, "mixed", 3, "string", "COLOR"),
    }


def test_rake_degree_scoring(spark):
    from search_spark.operators.keywords import rake_keywords

    docs = spark.createDataFrame(
        [(1, "fast spark engine beats the slow engine a lot")],
        schema="doc_id int, text string",
    )
    got = {r.phrase: (r.score, r.n_words) for r in
           rake_keywords(docs, ("the", "a"), top_k=5, min_len=2).collect()}
    # phrases: 'fast spark engine beats' (len 4), 'slow engine' (len 2),
    # 'lot' (len 1, dropped by min_len). deg: engine 4+2=6, others = own
    # phrase len. scores: 4+4+6+4=18; 2+6=8.
    assert got == {
        "fast spark engine beats": (18, 4),
        "slow engine": (8, 2),
    }


def test_degree_histogram_bins_are_log2_exact(spark):
    from search_spark.queries import QUERIES

    df = QUERIES["kg_degree_histogram"].spark(spark, SF_DIR)
    bad = df.filter(
        (F.col("min_degree") < F.pow(F.lit(2.0), F.col("bin_id")))
        | (
            F.col("max_degree")
            >= F.pow(F.lit(2.0), F.col("bin_id") + 1)
        )
    ).count()
    assert bad == 0


def test_rake_plan_has_no_python(spark):
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["keyword_rake"].spark(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_sameas_rewrite_merges_components_and_counts_sources(spark):
    from search_spark.operators.canonicalize import sameas_rewrite

    triples = spark.createDataFrame(
        [
            ("r1", "name", "Ada"),
            ("r2", "name", "Ada"),
            ("r2", "city", "Paris"),
            ("r3", "name", "Bob"),
            ("r4", "city", "r3"),  # object-side rewrite: r3 merges into r3's class
        ],
        schema="subj string, pred string, obj string",
    )
    sameas = spark.createDataFrame(
        [("r1", "r2"), ("r3", "r5")], schema="a string, b string"
    )
    rows = {
        (r.subj, r.pred, r.obj): r.n_sources
        for r in sameas_rewrite(triples, sameas).collect()
    }
    # r1/r2 merge to r1; the duplicated name fact carries n_sources=2
    assert rows[("r1", "name", "Ada")] == 2
    assert rows[("r1", "city", "Paris")] == 1
    # r3 merges to r3 (min of {r3, r5}); object side rewritten too
    assert rows[("r3", "name", "Bob")] == 1
    assert rows[("r4", "city", "r3")] == 1
    assert len(rows) == 4


def test_sameas_rewrite_no_pairs_is_identity_with_counts(spark):
    from search_spark.operators.canonicalize import sameas_rewrite

    triples = spark.createDataFrame(
        [("x", "p", "1"), ("x", "p", "1"), ("y", "p", "1")],
        schema="subj string, pred string, obj string",
    )
    sameas = spark.createDataFrame([], schema="a string, b string")
    rows = {
        (r.subj, r.pred, r.obj): r.n_sources
        for r in sameas_rewrite(triples, sameas).collect()
    }
    assert rows == {("x", "p", "1"): 1, ("y", "p", "1"): 1}


def test_pipeline_merge_sameas_flag_wiring(spark):
    """merge_sameas_preds applies the schema- and row-preserving merge:
    columns and row count unchanged, and the surviving subjects are
    exactly the component representatives of the unmerged output."""
    from search_spark import datagen
    from search_spark.operators.blocking import ifp_candidates
    from search_spark.operators.canonicalize import sameas_components
    from search_spark.pipeline import PipelineConfig, build_triples

    pages = datagen.generate_web_pages(spark, 40, seed=7)
    plain = build_triples(spark, pages, PipelineConfig()).localCheckpoint()
    merged = build_triples(
        spark,
        pages,
        PipelineConfig(merge_sameas_preds=["START_WITH_DIFFERENT_LETTER"]),
    )
    assert merged.columns == plain.columns
    assert merged.count() == plain.count()

    comps = {
        r.node: r.component
        for r in sameas_components(
            ifp_candidates(
                plain.select("subj", "pred", "obj"),
                ["START_WITH_DIFFERENT_LETTER"],
                max_group=50,
            ).select("a", "b")
        ).collect()
    }
    expected_subjs = {
        comps.get(r.subj, r.subj) for r in plain.select("subj").collect()
    }
    got_subjs = {r.subj for r in merged.select("subj").distinct().collect()}
    assert got_subjs == expected_subjs
    assert comps, "fixture must actually produce at least one sameAs pair"
