"""Unit tests for SPARQL-style basic-graph-pattern matching and BFS.

Reference context: the reference materializes (subj, pred, obj, prov)
rows into its mining cache (database/mining_cache.py) and queries them
with ad-hoc SQL; match_bgp is the engine-native conjunctive-query surface
over that table.
"""

import pytest
from pyspark.sql import functions as F

from search_spark.operators.bgp import (
    ask,
    construct,
    describe,
    forward_chain,
    match_bgp,
    order_patterns,
)
from search_spark.operators.graph import bfs_distances

TRIPLES = [
    # (subj, pred, obj, prov) — prov must be ignored by BGP matching
    ("alice", "knows", "bob", "d1:0"),
    ("alice", "knows", "bob", "d2:3"),  # duplicate fact, distinct prov
    ("bob", "knows", "carol", "d1:1"),
    ("carol", "knows", "alice", "d3:0"),
    ("alice", "type", "person", "d1:0"),
    ("bob", "type", "person", "d1:1"),
    ("carol", "type", "robot", "d3:0"),
    ("loop", "knows", "loop", "d4:0"),
    ("loop", "type", "robot", "d4:0"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj", "prov"])


def test_single_pattern_constants_pushed(triples):
    out = match_bgp(triples, [("?x", "type", "person")])
    assert sorted(r["x"] for r in out.collect()) == ["alice", "bob"]


def test_join_on_shared_variable(triples):
    out = match_bgp(
        triples,
        [("?x", "knows", "?y"), ("?y", "type", "robot")],
    )
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("bob", "carol"), ("loop", "loop")}


def test_duplicate_provenance_collapses_to_set_semantics(triples):
    out = match_bgp(triples, [("?x", "knows", "bob")])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["x"] == "alice"


def test_repeated_variable_within_pattern(triples):
    out = match_bgp(triples, [("?x", "knows", "?x")])
    assert [r["x"] for r in out.collect()] == ["loop"]


def test_three_pattern_chain_column_order(triples):
    out = match_bgp(
        triples,
        [
            ("?a", "knows", "?b"),
            ("?b", "knows", "?c"),
            ("?c", "type", "?t"),
        ],
    )
    assert out.columns == ["a", "b", "c", "t"]
    got = {tuple(r) for r in out.collect()}
    assert ("alice", "bob", "carol", "robot") in got
    assert ("bob", "carol", "alice", "person") in got


def test_disconnected_pattern_raises(triples):
    with pytest.raises(ValueError, match="cartesian"):
        match_bgp(
            triples,
            [("?x", "knows", "?y"), ("?a", "type", "?b")],
        )


def test_no_variable_pattern_raises(triples):
    with pytest.raises(ValueError, match="binds no variables"):
        match_bgp(triples, [("alice", "knows", "bob")])


def test_empty_bgp_raises(triples):
    with pytest.raises(ValueError, match="empty"):
        match_bgp(triples, [])


def test_bgp_plan_has_no_cartesian_and_pushes_filters(triples):
    out = match_bgp(
        triples,
        [("?x", "knows", "?y"), ("?y", "type", "robot")],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_optional_left_joins_with_null(triples):
    # everyone with a type; who they know, NULL if nobody
    out = match_bgp(
        triples,
        [("?x", "type", "?t")],
        optional=[("?x", "knows", "?y")],
    )
    got = {(r["x"], r["t"], r["y"]) for r in out.collect()}
    assert ("alice", "person", "bob") in got
    assert ("loop", "robot", "loop") in got
    # carol knows alice — matched; no NULL row for carol
    assert ("carol", "robot", "alice") in got
    assert not any(x == "carol" and y is None for x, _, y in got)


def test_optional_null_when_unmatched(spark):
    t = spark.createDataFrame(
        [("a", "type", "person"), ("b", "type", "person"), ("a", "knows", "b")],
        ["subj", "pred", "obj"],
    )
    out = match_bgp(
        t, [("?x", "type", "person")], optional=[("?x", "knows", "?y")]
    )
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", None)}


def test_not_exists_filters_bindings(triples):
    # people nobody knows (no triple ?z knows ?x)
    out = match_bgp(
        triples,
        [("?x", "type", "?t")],
        not_exists=[("?z", "knows", "?x")],
    )
    # alice<-carol, bob<-alice, carol<-bob, loop<-loop all known; none left
    assert out.count() == 0
    t2 = match_bgp(
        triples,
        [("?x", "type", "person")],
        not_exists=[("?x", "knows", "carol")],
    )
    assert sorted(r["x"] for r in t2.collect()) == ["alice"]


def test_optional_disconnected_raises(triples):
    with pytest.raises(ValueError, match="cartesian"):
        match_bgp(
            triples,
            [("?x", "type", "person")],
            optional=[("?a", "knows", "?b")],
        )


def test_order_patterns_selectivity_and_connectivity():
    counts = {"rare": 10, "common": 10_000}
    pats = [
        ("?a", "common", "?b"),
        ("?b", "rare", "?c"),
        ("?c", "common", "constant"),
    ]
    got = order_patterns(pats, counts, total=10_010)
    # rare starts; the constant-bound common pattern (est 1000) beats the
    # unbound one (est 10000); connectivity holds at every step
    assert got == [
        ("?b", "rare", "?c"),
        ("?c", "common", "constant"),
        ("?a", "common", "?b"),
    ]
    # variable predicate estimates at the full triple count
    got2 = order_patterns(
        [("?a", "?p", "?b"), ("?a", "rare", "?c")], counts, total=10_010
    )
    assert got2[0] == ("?a", "rare", "?c")


def test_order_patterns_defers_disconnected():
    counts = {"p": 5, "q": 50}
    # q-pattern shares no var with the p-pattern: it must still come
    # after, preserving the original no-cartesian failure mode
    got = order_patterns(
        [("?x", "q", "?y"), ("?a", "p", "?b")], counts, total=55
    )
    assert got == [("?a", "p", "?b"), ("?x", "q", "?y")]


def test_match_bgp_optimize_same_result_and_columns(triples):
    pats = [
        ("?a", "knows", "?b"),
        ("?b", "knows", "?c"),
        ("?c", "type", "robot"),
    ]
    plain = match_bgp(triples, pats)
    opt = match_bgp(triples, pats, optimize=True)
    assert opt.columns == plain.columns == ["a", "b", "c"]
    assert sorted(map(tuple, opt.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_ask(triples):
    assert ask(triples, [("?x", "knows", "carol")]) is True
    assert ask(triples, [("?x", "knows", "nobody")]) is False
    assert (
        ask(
            triples,
            [("?x", "type", "person")],
            not_exists=[("?x", "knows", "?y")],
        )
        is False
    )


def test_describe_includes_subject_and_object_sides(triples):
    out = describe(triples, "carol")
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert got == {
        ("bob", "knows", "carol"),
        ("carol", "knows", "alice"),
        ("carol", "type", "robot"),
    }
    # provenance column passes through
    assert "prov" in out.columns


def test_registered_domain_col(spark):
    from search_spark.operators.urls import registered_domain_col

    cases = [
        ("https://news.example.com/a/b?q=1", "example.com"),
        ("http://www.example.com", "example.com"),
        ("HTTPS://CDN.Media.NET:8080/x", "media.net"),
        ("sample.org/path", "sample.org"),
        ("a.b.c.deep.example.org#frag", "example.org"),
        ("http://localhost:9000/x", "localhost"),
    ]
    df = spark.createDataFrame(cases, ["url", "want"])
    bad = df.filter(registered_domain_col("url") != F.col("want"))
    assert bad.count() == 0, bad.collect()


# -- CONSTRUCT + forward chaining ---------------------------------------------


def test_construct_templated_triples(triples):
    out = construct(
        triples,
        [("?x", "knows", "?y"), ("?y", "type", "robot")],
        [("?x", "knows_robot", "?y"), ("?y", "is", "known_robot")],
    )
    got = {tuple(r) for r in out.collect()}
    assert got == {
        ("bob", "knows_robot", "carol"),
        ("loop", "knows_robot", "loop"),
        ("carol", "is", "known_robot"),
        ("loop", "is", "known_robot"),
    }
    assert out.columns == ["subj", "pred", "obj"]


def test_construct_drops_null_optional_bindings(spark):
    t = spark.createDataFrame(
        [("a", "type", "person"), ("b", "type", "person"), ("a", "knows", "b")],
        ["subj", "pred", "obj"],
    )
    out = construct(
        t,
        [("?x", "type", "person")],
        [("?x", "friend_of", "?y")],
        optional=[("?x", "knows", "?y")],
    )
    assert [tuple(r) for r in out.collect()] == [("a", "friend_of", "b")]


def test_construct_unbound_template_var_raises(triples):
    with pytest.raises(ValueError, match="not bound"):
        construct(triples, [("?x", "type", "person")], [("?x", "p", "?zzz")])


def test_forward_chain_transitive_closure(spark):
    t = spark.createDataFrame(
        [("a", "next", "b"), ("b", "next", "c"), ("c", "next", "d")],
        ["subj", "pred", "obj"],
    )
    closed = forward_chain(
        t,
        rules=[
            ([("?x", "next", "?y")], [("?x", "reach", "?y")]),
            (
                [("?x", "reach", "?y"), ("?y", "reach", "?z")],
                [("?x", "reach", "?z")],
            ),
        ],
        max_rounds=5,
    )
    reach = {
        (r["subj"], r["obj"])
        for r in closed.filter(F.col("pred") == "reach").collect()
    }
    assert reach == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }
    # base facts survive
    assert closed.filter(F.col("pred") == "next").count() == 3


def test_forward_chain_round_bound(spark):
    # chain of 9 'next' hops: closure needs ~4 doubling rounds; 1 round
    # (derive 'reach') + 1 round of transitivity only reaches 2 hops
    rows = [(f"n{i}", "next", f"n{i+1}") for i in range(9)]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    closed = forward_chain(
        t,
        rules=[
            ([("?x", "next", "?y")], [("?x", "reach", "?y")]),
            (
                [("?x", "reach", "?y"), ("?y", "reach", "?z")],
                [("?x", "reach", "?z")],
            ),
        ],
        max_rounds=2,
    )
    reach = {
        (r["subj"], r["obj"])
        for r in closed.filter(F.col("pred") == "reach").collect()
    }
    assert ("n0", "n2") in reach
    assert ("n0", "n9") not in reach


# -- BFS hop distances -------------------------------------------------------

EDGES = [
    ("a", "b"),
    ("b", "c"),
    ("c", "d"),
    ("d", "e"),
    ("a", "c"),  # shortcut: c is dist 1, not 2
    ("x", "y"),  # disconnected from the seed
    ("e", "a"),  # back edge — distances stay first-discovery
]


def test_bfs_distances_basic(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["entity"])
    got = {r["entity"]: r["dist"] for r in bfs_distances(edges, seeds, 4).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_distances_hop_bound(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["entity"])
    got = {r["entity"]: r["dist"] for r in bfs_distances(edges, seeds, 2).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_multiple_seeds(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("x",)], ["entity"])
    got = {r["entity"]: r["dist"] for r in bfs_distances(edges, seeds, 1).collect()}
    assert got == {"a": 0, "x": 0, "b": 1, "c": 1, "y": 1}
