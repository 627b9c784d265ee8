"""Unit tests for multi-source knowledge fusion (operators/fusion.py)."""

from search_spark.operators.fusion import (
    fuse,
    fuse_and_resolve,
    resolve_functional,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, schema="subj string, pred string, obj string"
    )


def test_fuse_counts_sources_and_provenance(spark):
    a = _triples(spark, [("e", "color", "red"), ("e", "color", "red")])
    b = _triples(spark, [("e", "color", "red"), ("e", "price", "3")])
    ev = {
        (r.subj, r.pred, r.obj): (r.n_prov, r.n_sources, r.priority)
        for r in fuse([("a", a), ("b", b)]).collect()
    }
    assert ev[("e", "color", "red")] == (3, 2, 0)
    assert ev[("e", "price", "3")] == (1, 1, 1)


def test_resolution_prefers_more_sources(spark):
    a = _triples(spark, [("e", "color", "red")])
    b = _triples(spark, [("e", "color", "blue")])
    c = _triples(spark, [("e", "color", "blue")])
    out = fuse_and_resolve([("a", a), ("b", b), ("c", c)]).collect()
    assert len(out) == 1 and out[0].obj == "blue"
    assert out[0].n_sources == 2


def test_resolution_falls_back_to_priority_then_lex(spark):
    # one source each — priority decides; equal priority → min obj
    a = _triples(spark, [("e", "color", "zzz")])
    b = _triples(spark, [("e", "color", "aaa")])
    out = fuse_and_resolve([("a", a), ("b", b)]).collect()
    assert out[0].obj == "zzz"  # a is higher-priority despite lex order
    # same source twice: n_prov decides before lex
    d = _triples(
        spark, [("e", "k", "zzz"), ("e", "k", "zzz"), ("e", "k", "aaa")]
    )
    out2 = fuse_and_resolve([("d", d)]).collect()
    assert [(r.obj, r.n_prov) for r in out2] == [("zzz", 2)]


def test_resolution_is_per_subject_predicate(spark):
    a = _triples(
        spark,
        [("e1", "color", "red"), ("e2", "color", "blue"), ("e1", "size", "L")],
    )
    out = resolve_functional(fuse([("a", a)]))
    got = {(r.subj, r.pred): r.obj for r in out.collect()}
    assert got == {
        ("e1", "color"): "red",
        ("e2", "color"): "blue",
        ("e1", "size"): "L",
    }
