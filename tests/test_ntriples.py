"""N-Triples serialization (operators/ntriples.py) — grammar escaping,
N-Quads mode, the text-file sink, and the shuffle-free plan."""

import glob

from search_spark.operators.ntriples import to_ntriples, write_ntriples


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, prov string"
    )


def test_literal_and_iri_escaping(spark):
    rows = [("a b", "p%1", 'say "hi"\n\tend\\', "g<1>")]
    got = to_ntriples(_df(spark, rows), graph_col="prov").collect()[0].line
    assert got == (
        "<http://example.org/kg/a%20b> <http://example.org/kg/p%251> "
        '"say \\"hi\\"\\n\\tend\\\\" <http://example.org/kg/g%3C1%3E> .'
    )


def test_triples_mode_has_no_graph_term(spark):
    got = to_ntriples(_df(spark, [("s", "p", "o", "g")])).collect()[0].line
    assert got == (
        "<http://example.org/kg/s> <http://example.org/kg/p> \"o\" ."
    )


def test_custom_namespace(spark):
    got = to_ntriples(
        _df(spark, [("s", "p", "o", "g")]), namespace="urn:x:"
    ).collect()[0].line
    assert got.startswith("<urn:x:s> <urn:x:p>")


def test_write_ntriples_roundtrip(spark, tmp_path):
    rows = [(f"s{i}", "p", f"o{i}", "g") for i in range(20)]
    out = str(tmp_path / "nt")
    write_ntriples(_df(spark, rows), out)
    files = glob.glob(out + "/part-*")
    assert files
    lines = sorted(
        line for f in files for line in open(f).read().splitlines()
    )
    assert len(lines) == 20
    assert lines[0].endswith(" .")
    back = spark.read.text(out)
    assert back.count() == 20


def test_plan_is_narrow_map(spark):
    plan = (
        to_ntriples(_df(spark, [("s", "p", "o", "g")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan
