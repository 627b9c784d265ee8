"""N-Quads export/import (io/ntriples.py): lossless roundtrip including
escape-hostile strings, plain-triple mode, and interop with the KG
pipeline's snapshot output."""

from __future__ import annotations

import pytest

from search_spark.io.ntriples import (
    read_ntriples,
    to_nquad_lines,
    write_ntriples,
)

NASTY = [
    ("a b", "rel/x", 'say "hi"', "s1"),
    ("tab\there", "p", "line1\nline2", "s2"),
    ("back\\slash", "p", "cr\rtab\t.", "s3"),
    ("ünïcode", "p", "naïve café", "s4"),
    ("<angle>", "p.q", "dot . end .", "s5"),
    ("plus+plus", "p", "percent%20", "s6"),
]
COLS = ["subj", "pred", "obj", "prov"]


def _rows(df):
    return sorted(
        (r["subj"], r["pred"], r["obj"], r["prov"]) for r in df.collect()
    )


def test_nquads_roundtrip_hostile_strings(spark, tmp_path):
    df = spark.createDataFrame(NASTY, COLS)
    path = str(tmp_path / "kg.nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    assert _rows(back) == _rows(df)


def test_ntriples_mode_without_prov(spark, tmp_path):
    df = spark.createDataFrame(NASTY, COLS).drop("prov")
    path = str(tmp_path / "plain.nt")
    write_ntriples(df, path, prov_col=None)
    back = read_ntriples(spark, path)
    assert back.filter("prov IS NOT NULL").count() == 0
    got = sorted((r["subj"], r["pred"], r["obj"]) for r in back.collect())
    want = sorted((s, p, o) for s, p, o, _ in NASTY)
    assert got == want


def test_lines_are_wellformed_nquads(spark):
    lines = [
        r["line"]
        for r in to_nquad_lines(
            spark.createDataFrame(NASTY, COLS)
        ).collect()
    ]
    for ln in lines:
        assert ln.startswith("<kg:entity/") and ln.endswith(" .")
        # exactly one unescaped-quote-delimited literal
        assert ln.count('"') - ln.count('\\"') == 2


def test_export_is_narrow_map(spark):
    from tests.test_plans import plan_of

    df = spark.createDataFrame(NASTY, COLS)
    plan = plan_of(to_nquad_lines(df))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_roundtrip_from_pipeline_snapshot(spark, tmp_path):
    from search_spark import datagen, pipeline
    from search_spark.io.snapshots import SnapshotTable

    root = str(tmp_path / "kg")
    pages = datagen.generate_web_pages(spark, 30, seed=5)
    pipeline.run_to_snapshot(spark, pages, root)
    triples = SnapshotTable(spark, root).load().select(
        "subj", "pred", "obj", "prov"
    )
    path = str(tmp_path / "export.nt")
    write_ntriples(triples, path)
    back = read_ntriples(spark, path)
    assert _rows(back) == _rows(triples)
