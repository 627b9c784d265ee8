"""Unit tests for the DIPRE-style pattern bootstrap (operators/bootstrap.py)."""

from pyspark.sql import functions as F

from search_spark.operators.bootstrap import (
    apply_patterns,
    bootstrap_round,
    induce_patterns,
    pair_contexts,
)


def _corpus(spark, docs):
    rows = [(i, t) for i, t in enumerate(docs)]
    d = spark.createDataFrame(rows, schema="doc_id long, text string")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("tpos", "tok")
    ).withColumn("tpos", F.col("tpos").cast("long"))
    return toks


def _mentions(spark, toks, vocab):
    gaz = spark.createDataFrame([(v,) for v in vocab], schema="pattern string")
    return toks.join(gaz, toks["tok"] == gaz["pattern"]).select(
        "doc_id", "tpos", F.col("tok").alias("mention")
    )


def test_pair_contexts_middles(spark):
    toks = _corpus(spark, ["alice works at acme", "bob at acme"])
    m = _mentions(spark, toks, ["alice", "acme", "bob"])
    got = {
        (r.doc_id, r.subj, r.obj, r.middle)
        for r in pair_contexts(toks, m, window=4).collect()
    }
    assert (0, "alice", "acme", "works at") in got
    assert (1, "bob", "acme", "at") in got


def test_adjacent_mentions_have_empty_middle(spark):
    toks = _corpus(spark, ["alice acme"])
    m = _mentions(spark, toks, ["alice", "acme"])
    [row] = pair_contexts(toks, m, window=2).collect()
    assert row.middle == ""


def test_window_bounds_pairing(spark):
    toks = _corpus(spark, ["alice x y z w acme"])
    m = _mentions(spark, toks, ["alice", "acme"])
    assert pair_contexts(toks, m, window=4).count() == 0
    assert pair_contexts(toks, m, window=5).count() == 1


def test_bootstrap_round_harvests_nonseed_pairs(spark):
    # seed (alice, acme) appears with the 'works at' pattern in two docs
    # (support 2); the pattern then harvests (carol, initech)
    docs = [
        "alice works at acme",
        "alice works at acme today",
        "alice joined acme",  # support-1 pattern → filtered
        "carol works at initech",
    ]
    toks = _corpus(spark, docs)
    m = _mentions(spark, toks, ["alice", "acme", "carol", "initech"])
    seeds = spark.createDataFrame(
        [("alice", "acme")], schema="subj string, obj string"
    )
    pats = induce_patterns(
        pair_contexts(toks, m, 4), seeds, min_support=1, top_k=10
    ).collect()
    by_pattern = {p.pattern: (p.support, p.n_occ) for p in pats}
    assert by_pattern["works at"] == (1, 2)
    out = bootstrap_round(
        toks, m, seeds, window=4, min_support=1, top_k=10
    ).collect()
    got = {(r.subj, r.obj, r.pattern, r.n_occ) for r in out}
    assert ("carol", "initech", "works at", 1) in got
    # seed pair itself is never re-emitted
    assert not any(r.subj == "alice" and r.obj == "acme" for r in out)


def test_min_support_needs_distinct_seeds(spark):
    # one seed pair repeated 3× is still support 1
    docs = ["alice works at acme"] * 3 + ["bob works at initech"]
    toks = _corpus(spark, docs)
    m = _mentions(spark, toks, ["alice", "acme", "bob", "initech"])
    seeds = spark.createDataFrame(
        [("alice", "acme"), ("bob", "initech")],
        schema="subj string, obj string",
    )
    pats = induce_patterns(
        pair_contexts(toks, m, 4), seeds, min_support=2, top_k=10
    ).collect()
    assert [p.pattern for p in pats] == ["works at"]
    assert pats[0].support == 2 and pats[0].n_occ == 4


def test_bootstrap_iterate_rounds_grow_seeds(spark):
    # round 1: seeds (alice,acme)+(bob,hooli) give 'works at' support 2 →
    # harvests (carol,initech); 'boss of' is support 1 → filtered.
    # round 2: carol joins the seeds, 'boss of' reaches support 2 →
    # harvests (dave,globex) — reachable only through the grown seed set.
    docs = [
        "alice works at acme",
        "bob works at hooli",
        "carol works at initech",
        "alice boss of acme",
        "carol boss of initech",
        "dave boss of globex",
    ]
    toks = _corpus(spark, docs)
    m = _mentions(
        spark,
        toks,
        ["alice", "acme", "bob", "hooli", "carol", "initech", "dave",
         "globex"],
    )
    seeds = spark.createDataFrame(
        [("alice", "acme"), ("bob", "hooli")],
        schema="subj string, obj string",
    )
    from search_spark.operators.bootstrap import bootstrap_iterate

    out = {
        (r.subj, r.obj): r.round
        for r in bootstrap_iterate(
            toks, m, seeds, rounds=2, min_support=2, top_k=10
        ).collect()
    }
    assert out == {("carol", "initech"): 1, ("dave", "globex"): 2}


def test_bootstrap_iterate_early_exit_empty_harvest(spark):
    toks = _corpus(spark, ["alice works at acme"])
    m = _mentions(spark, toks, ["alice", "acme"])
    seeds = spark.createDataFrame(
        [("alice", "acme")], schema="subj string, obj string"
    )
    from search_spark.operators.bootstrap import bootstrap_iterate

    # the only pair IS the seed → nothing to harvest, loop exits round 1
    out = bootstrap_iterate(toks, m, seeds, rounds=5, min_support=1)
    assert out.count() == 0
