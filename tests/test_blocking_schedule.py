"""Sorted-neighborhood blocking, politeness scheduling, entity summary,
BGP aggregates, incremental CC — behavior + scale-shape assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import SF_DIR, plan_of


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_global_rank_matches_window_semantics(spark):
    from search_spark.operators.blocking import global_rank

    rows = [(c,) for c in "qwertyuiopasdfghjklzxcvbnm"]
    df = spark.createDataFrame(rows, schema="k string").repartition(7)
    got = {
        r.k: r.rank for r in global_rank(df, ["k"]).collect()
    }
    expected = {
        k: i + 1 for i, (k,) in enumerate(sorted(rows))
    }
    assert got == expected


def test_sorted_neighborhood_pairs_window3(spark):
    from search_spark.operators.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "c"), (4, "d")], schema="id int, k string"
    )
    got = _rows(
        sorted_neighborhood_pairs(df, "id", "k", window=3).select(
            "a_id", "b_id", "rank_gap"
        )
    )
    # sorted order: a(2) b(1) c(3) d(4)
    assert got == {
        (2, 1, 1),
        (2, 3, 2),
        (1, 3, 1),
        (1, 4, 2),
        (3, 4, 1),
    }


def test_sorted_neighborhood_no_single_partition_window(spark):
    """The global rank must never funnel all rows through one window
    task: the plan's window specs are all partitioned (_pid)."""
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["sorted_neighborhood"].spark(spark, SF_DIR))
    import re

    for spec in re.findall(r"Window \[row_number\(\)[^\]]*\]", plan):
        assert "_pid" in spec, spec
    assert "CartesianProduct" not in plan


def test_politeness_schedule_slots_and_cap(spark):
    from search_spark.operators.crawl import politeness_schedule

    frontier = spark.createDataFrame(
        [
            ("https://a.example/1", 0.9, "new"),
            ("https://a.example/2", 0.5, "new"),
            ("https://a.example/3", 0.9, "stale"),
            ("https://b.example/1", 0.1, "new"),
        ],
        schema="loc string, priority double, reason string",
    )
    got = _rows(
        politeness_schedule(frontier, crawl_delay_s=2.0, max_per_host=2)
    )
    # host a: priority 0.9 ties break on loc; /2 (slot 2) capped away
    assert got == {
        ("https://a.example/1", "a.example", 0, 0.0),
        ("https://a.example/3", "a.example", 1, 2.0),
        ("https://b.example/1", "b.example", 0, 0.0),
    }


def test_incremental_cc_equals_full_cc(spark):
    from search_spark.queries import QUERIES

    inc = _rows(
        QUERIES["kg_components_incremental"].spark(spark, SF_DIR)
    )
    full = _rows(QUERIES["kg_components"].spark(spark, SF_DIR))
    assert inc == full


def test_entity_summary_rank_bounded(spark):
    from search_spark.queries import QUERIES

    df = QUERIES["kg_entity_summary"].spark(spark, SF_DIR)
    agg = df.groupBy("subj").agg(
        F.max("fact_rank").alias("mx"), F.count("*").alias("n")
    )
    bad = agg.filter((F.col("mx") > 3) | (F.col("n") > 3)).count()
    assert bad == 0


def test_fact_history_interval_consistency(spark):
    from search_spark.queries import QUERIES

    df = QUERIES["kg_fact_history"].spark(spark, SF_DIR)
    bad = df.filter(
        (F.col("first_seen") > F.col("last_seen"))
        | (F.col("active_days") < 1)
        | (F.col("n_docs") < 1)
    ).count()
    assert bad == 0
    # at least one fact is seen on more than one day in the fixture corpus
    assert df.filter(F.col("active_days") > 1).count() > 0
