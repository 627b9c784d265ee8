"""N-Quads export/import (io/ntriples.py) — grammar escaping, lossless
roundtrip including adversarial strings, and the shuffle-free plan."""

import glob

from search_spark.io.ntriples import (
    read_ntriples,
    to_nquad_lines,
    write_ntriples,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, prov string"
    )


def test_literal_and_iri_escaping(spark):
    rows = [("a b", "p%1", 'say "hi"\n\tend\\', "g<1>")]
    got = to_nquad_lines(_df(spark, rows)).collect()[0].line
    assert got == (
        "<kg:entity/a%20b> <kg:pred/p%251> "
        '"say \\"hi\\"\\n\\tend\\\\" <kg:prov/g%3C1%3E> .'
    )


def test_triples_mode_without_prov(spark):
    df = _df(spark, [("s", "p", "o", "g")]).drop("prov")
    got = to_nquad_lines(df).collect()[0].line
    assert got == '<kg:entity/s> <kg:pred/p> "o" .'


def test_roundtrip_lossless_adversarial(spark, tmp_path):
    # strings chosen to stress the invertibility of the minimal
    # percent-encoding: pre-encoded-looking sequences, plus signs (the
    # old url_encode form-decoding corrupted them), every escaped char
    rows = [
        ("%3C literal", "a+b", 'quote " back \\ nl \n tab \t', "p%25"),
        ("<angle>", "{curly}", "plain", "g|h^i`j"),
        ("ünïcode", "naïve", "café", "日本語"),
    ]
    out = str(tmp_path / "nq")
    write_ntriples(_df(spark, rows), out)
    back = read_ntriples(spark, out)
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)


def test_write_produces_text_parts(spark, tmp_path):
    rows = [(f"s{i}", "p", f"o{i}", "g") for i in range(20)]
    out = str(tmp_path / "nt")
    write_ntriples(_df(spark, rows), out)
    files = glob.glob(out + "/part-*")
    assert files
    lines = sorted(
        line for f in files for line in open(f).read().splitlines()
    )
    assert len(lines) == 20 and lines[0].endswith(" .")


def test_plan_is_narrow_map(spark):
    plan = (
        to_nquad_lines(_df(spark, [("s", "p", "o", "g")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan


def test_null_prov_exports_plain_triple_line(spark, tmp_path):
    # a NULL graph label is the default graph — the line must not be
    # NULLed away by the concat (silent quad loss on export)
    from search_spark.io.ntriples import (
        read_ntriples, to_nquad_lines, write_ntriples,
    )

    df = spark.createDataFrame(
        [("x", "p", "1", "gA"), ("y", "p", "2", None)],
        "subj string, pred string, obj string, prov string",
    )
    lines = sorted(r.line for r in to_nquad_lines(df).collect())
    assert lines == [
        '<kg:entity/x> <kg:pred/p> "1" <kg:prov/gA> .',
        '<kg:entity/y> <kg:pred/p> "2" .',
    ]
    out = str(tmp_path / "mixed.nt")
    write_ntriples(df, out)
    back = read_ntriples(spark, out)
    assert sorted(
        (r.subj, r.pred, r.obj, r.prov) for r in back.collect()
    ) == [("x", "p", "1", "gA"), ("y", "p", "2", None)]


def test_turtle_blocks_grouping_and_object_lists(spark):
    from search_spark.io.ntriples import to_turtle_blocks

    df = spark.createDataFrame(
        [
            ("Insulin", "TREATS", "Diabetes"),
            ("Insulin", "TREATS", "T2D"),
            ("Insulin", "TREATS", "Diabetes"),  # duplicate collapses
            ("Insulin", "FOUND_IN", "pancreas"),
            ("Zinc", "BINDS", 'say "hi"'),
        ],
        schema="subj string, pred string, obj string",
    )
    blocks = {r.subj: r.block for r in to_turtle_blocks(df).collect()}
    assert blocks["Insulin"] == (
        '<kg:entity/Insulin> <kg:pred/FOUND_IN> "pancreas" ;\n'
        '    <kg:pred/TREATS> "Diabetes", "T2D" .'
    )
    # literal escaping shared with the N-Triples writer
    assert blocks["Zinc"] == '<kg:entity/Zinc> <kg:pred/BINDS> "say \\"hi\\"" .'


def test_write_turtle_parts_are_valid_blocks(spark, tmp_path):
    from search_spark.io.ntriples import to_turtle_blocks, write_turtle

    df = spark.createDataFrame(
        [("a b", "p", "x"), ("c", "p", "y")],
        schema="subj string, pred string, obj string",
    )
    out = str(tmp_path / "ttl")
    write_turtle(df, out)
    text = "\n".join(
        r.value for r in spark.read.text(out).collect()
    )
    expected = {r.block for r in to_turtle_blocks(df).collect()}
    for block in expected:
        assert block in text
    assert "<kg:entity/a%20b>" in text  # IRI encoding applied


def test_turtle_roundtrip_lossless(spark, tmp_path):
    """write_turtle → read_turtle is lossless on the distinct triple set,
    including literals with quotes, commas, ', ' sequences, newlines,
    tabs and trailing backslashes — the cases that stress the block
    framing and the '\", \"' object-list separator."""
    from search_spark.io.ntriples import read_turtle, write_turtle

    rows = [
        ("Insulin", "TREATS", "Diabetes"),
        ("Insulin", "TREATS", "T2D"),
        ("Insulin", "FOUND_IN", "pancreas"),
        ("a b", "p/q", "multi\nline"),
        ("x", "p", 'say "hi", "there"'),
        ("x", "p", "ends with backslash\\"),
        ("x", "q", "tab\there, and, commas"),
        ("y", "p", 'quote" then, space'),
    ]
    df = spark.createDataFrame(
        rows, schema="subj string, pred string, obj string"
    )
    out = str(tmp_path / "ttl_rt")
    write_turtle(df, out)
    back = {
        (r.subj, r.pred, r.obj) for r in read_turtle(spark, out).collect()
    }
    assert back == set(rows)


def test_turtle_roundtrip_random_nasty_strings(spark, tmp_path):
    import random

    from search_spark.io.ntriples import read_turtle, write_turtle

    rng = random.Random(20260821)
    alphabet = list('abc .,;"\\\n\t\r<>%{}|^`') + ['", "', " ;\n    ", " .\n"]

    def nasty(maxlen=12):
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, maxlen))
        )

    rows = {
        (nasty(6) or "s", nasty(4) or "p", nasty())
        for _ in range(120)
    }
    df = spark.createDataFrame(
        sorted(rows), schema="subj string, pred string, obj string"
    )
    out = str(tmp_path / "ttl_fuzz")
    write_turtle(df, out)
    back = {
        (r.subj, r.pred, r.obj) for r in read_turtle(spark, out).collect()
    }
    assert back == rows


def test_read_ntriples_iri_objects_and_comments(spark, tmp_path):
    """ADVICE r4: IRI-object triples are legal N-Triples and must parse
    (engine entity IRIs decode, foreign IRIs keep their text); comment/
    blank-only documents are legal zero-quad sources."""
    from search_spark.io.ntriples import DEFAULT_BASE, read_ntriples

    p = tmp_path / "mixed.nt"
    p.write_text(
        "# a comment line\n"
        "\n"
        f'<{DEFAULT_BASE}entity/Alice> <{DEFAULT_BASE}pred/knows> '
        f"<{DEFAULT_BASE}entity/Bob> .\n"
        f'<{DEFAULT_BASE}entity/Alice> <{DEFAULT_BASE}pred/site> '
        "<http://example.org/a?x=1> .\n"
        f'<{DEFAULT_BASE}entity/Alice> <{DEFAULT_BASE}pred/name> '
        '"alice" .\n'
    )
    rows = sorted(
        (r.subj, r.pred, r.obj)
        for r in read_ntriples(spark, str(p)).collect()
    )
    assert rows == [
        ("Alice", "knows", "Bob"),
        ("Alice", "name", "alice"),
        ("Alice", "site", "http://example.org/a?x=1"),
    ]


def test_sparql_load_comment_only_source_is_zero_inserts(spark, tmp_path):
    """A non-empty but comment/blank-only N-Triples document LOADs
    successfully with zero inserts (no format-mismatch error)."""
    from search_spark.io.snapshots import SnapshotTable
    from search_spark.operators.sparql import sparql_update

    src = tmp_path / "comments.nt"
    src.write_text("# only comments here\n\n# more\n")
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2)
    res = sparql_update(table, f"LOAD <file://{src}>")
    assert res["n_rows"] == 0


def test_sparql_load_garbage_still_errors(spark, tmp_path):
    from search_spark.io.snapshots import SnapshotTable
    from search_spark.operators.sparql import SparqlError, sparql_update

    src = tmp_path / "garbage.nt"
    src.write_text("this is not ntriples at all\n")
    table = SnapshotTable(spark, str(tmp_path / "t2"), n_buckets=2)
    import pytest as _pytest

    with _pytest.raises(SparqlError):
        sparql_update(table, f"LOAD <file://{src}>")
