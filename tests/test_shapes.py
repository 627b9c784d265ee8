"""SHACL-lite shape validation unit tests — one per constraint kind."""

import pytest

from search_spark.operators.shapes import Shape, validate_shapes

TRIPLES = [
    ("alice", "type", "person"),
    ("bob", "type", "person"),
    ("acme", "type", "org"),
    ("alice", "works_at", "acme"),
    ("bob", "works_at", "ghost_co"),      # range violation: untyped org
    ("mystery", "works_at", "acme"),      # domain violation: untyped subject
    ("alice", "email", "alice@example.com"),
    ("bob", "email", "not-an-email"),     # pattern violation
    ("alice", "knows", "bob"),
    ("alice", "knows", "acme"),
    ("alice", "knows", "mystery"),        # alice has 3 distinct knows
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])


def _rows(df):
    return {(r["shape"], r["node"], r["detail"]) for r in df.collect()}


def test_domain_and_range(triples):
    got = _rows(
        validate_shapes(
            triples,
            [
                Shape("d", "domain", "works_at", cls="person",
                      type_pred="type"),
                Shape("r", "range", "works_at", cls="org", type_pred="type"),
            ],
        )
    )
    assert got == {
        ("d", "mystery", "missing type person"),
        ("r", "ghost_co", "missing type org"),
    }


def test_pattern(triples):
    got = _rows(
        validate_shapes(
            triples,
            [Shape("e", "pattern", "email", regex=r"^[^@\s]+@[^@\s]+$")],
        )
    )
    assert got == {("e", "bob", "bad value not-an-email")}


def test_cardinality_bounds(triples):
    got = _rows(
        validate_shapes(
            triples,
            [
                # every person must know at least one node
                Shape("min", "min_count", "knows", cls="person", lo=1,
                      type_pred="type"),
                # and at most two
                Shape("max", "max_count", "knows", cls="person", hi=2,
                      type_pred="type"),
            ],
        )
    )
    assert got == {
        ("min", "bob", "knows count 0"),
        ("max", "alice", "knows count 3"),
    }


def test_conforming_graph_is_empty(triples):
    out = validate_shapes(
        triples,
        [Shape("d", "domain", "email", cls="person", type_pred="type")],
    )
    assert out.count() == 0


def test_unknown_kind_raises(triples):
    with pytest.raises(ValueError, match="unknown shape kind"):
        validate_shapes(triples, [Shape("x", "exactly_one", "knows")])


def test_no_shapes_raises(triples):
    with pytest.raises(ValueError, match="no shapes"):
        validate_shapes(triples, [])
