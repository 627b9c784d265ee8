"""Unit tests for the property-path evaluator (operators/paths.py)."""

from pyspark.sql import functions as F

from search_spark.operators.paths import (
    Alt,
    Inv,
    Pred,
    Repeat,
    Seq,
    eval_path,
    normalize,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, schema="subj string, pred string, obj string"
    )


def _pairs(df):
    return {(r.src, r.dst) for r in df.collect()}


def test_normalize_pushes_inverse_to_leaves():
    expr = Inv(Seq(Pred("a"), Alt(Pred("b"), Inv(Pred("c")))))
    n = normalize(expr)
    # ^(a/(b|^c)) = (^b|c)/^a
    assert n == Seq(Alt(Pred("b", True), Pred("c", False)), Pred("a", True))


def test_pred_and_inverse(spark):
    t = _triples(spark, [("x", "p", "y"), ("y", "p", "z"), ("x", "q", "w")])
    assert _pairs(eval_path(t, Pred("p"))) == {("x", "y"), ("y", "z")}
    assert _pairs(eval_path(t, Inv(Pred("p")))) == {("y", "x"), ("z", "y")}


def test_seq_and_alt(spark):
    t = _triples(spark, [("x", "p", "y"), ("y", "q", "z"), ("x", "q", "w")])
    assert _pairs(eval_path(t, Seq(Pred("p"), Pred("q")))) == {("x", "z")}
    assert _pairs(eval_path(t, Alt(Pred("p"), Pred("q")))) == {
        ("x", "y"),
        ("y", "z"),
        ("x", "w"),
    }


def test_repeat_bounded_hops(spark):
    # chain a->b->c->d->e via p
    chain = [(c1, "p", c2) for c1, c2 in zip("abcd", "bcde")]
    t = _triples(spark, chain)
    got = _pairs(eval_path(t, Repeat(Pred("p"), 2)))
    assert got == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),  # 1 hop
        ("a", "c"), ("b", "d"), ("c", "e"),              # 2 hops
    }


def test_repeat_early_exit_at_fixpoint(spark):
    # 3-cycle saturates after 3 rounds; max_hops=10 must still terminate
    t = _triples(
        spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")]
    )
    got = _pairs(eval_path(t, Repeat(Pred("p"), 10)))
    assert got == {(s, d) for s in "abc" for d in "abc"}


def test_seeded_equals_filtered_unseeded(spark):
    t = _triples(
        spark,
        [
            ("a", "p", "b"),
            ("b", "p", "c"),
            ("x", "p", "y"),
            ("b", "q", "t1"),
            ("y", "q", "t2"),
        ],
    )
    path = Seq(Repeat(Pred("p"), 3), Pred("q"))
    seeds = spark.createDataFrame([("a",)], schema="src string")
    seeded = _pairs(eval_path(t, path, seeds))
    unseeded = {
        p for p in _pairs(eval_path(t, path)) if p[0] == "a"
    }
    assert seeded == unseeded == {("a", "t1")}


def test_inverse_of_seq_traverses_backwards(spark):
    t = _triples(spark, [("x", "p", "y"), ("y", "q", "z")])
    assert _pairs(eval_path(t, Inv(Seq(Pred("p"), Pred("q"))))) == {
        ("z", "x")
    }
