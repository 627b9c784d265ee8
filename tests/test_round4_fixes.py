"""Round-4 hardening: ADVICE.md r3 findings.

Covers:
  * kge complex_score derives the re‖im half from the actual array width,
    so an explicit even dim != 32 yields real energies (was: silent NULLs
    from slicing past the array end); odd dims raise instead of mispacking,
  * a tombstone squash (no surviving data) no longer poisons
    _needs_schema_merge into forcing mergeSchema on every later load,
  * _needs_schema_merge compares schemas order-insensitively — a column
    reorder with identical name/type sets does not force mergeSchema,
  * SPARQL LOAD surfaces a format/suffix mismatch (non-empty source, zero
    quads parsed) instead of committing an empty load; SILENT swallows it.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from search_spark.io.snapshots import SnapshotTable
from search_spark.operators import kge
from search_spark.operators.sparql import SparqlError, sparql_update


# -- kge: complex model at non-default dims ---------------------------------

def _triples(spark):
    return spark.createDataFrame(
        [("a", "p", "b"), ("c", "q", "d"), ("e", "p", "f")],
        "subj string, pred string, obj string",
    )


def test_complex_score_explicit_even_dim(spark):
    """dim=8 (≠ 2·EMB_DIM=32): every energy must be a real value — the
    old hardcoded half=16 sliced past the 8-wide arrays and nulled the
    aggregate."""
    out = kge.score_triples(_triples(spark), dim=8, model="complex")
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.energy is not None for r in rows)


def test_complex_rank_explicit_even_dim(spark):
    cands = spark.createDataFrame(
        [("b",), ("d",), ("f",), ("zzz",)], "entity string"
    )
    ranked = kge.rank_tails(_triples(spark), cands, dim=8, model="complex")
    rows = ranked.collect()
    assert len(rows) == 3
    assert all(r.energy is not None and r.rank >= 1 for r in rows)
    assert all(r.n_candidates == 3 for r in rows)  # true tail excluded


def test_complex_dim_consistency(spark):
    """The dynamic half must reproduce the registered-default result."""
    a = kge.score_triples(_triples(spark), model="complex").collect()
    b = kge.score_triples(
        _triples(spark), dim=2 * kge.EMB_DIM, model="complex"
    ).collect()
    assert sorted((r.subj, r.energy) for r in a) == sorted(
        (r.subj, r.energy) for r in b
    )


def test_complex_odd_dim_raises(spark):
    with pytest.raises(ValueError, match="even"):
        kge.score_triples(_triples(spark), dim=7, model="complex")
    cands = spark.createDataFrame([("b",)], "entity string")
    with pytest.raises(ValueError, match="even"):
        kge.rank_tails(_triples(spark), cands, dim=9, model="complex")


# -- snapshots: schema-merge gating -----------------------------------------

def _write_lineage(root, k, body):
    os.makedirs(f"{root}/_lineage", exist_ok=True)
    with open(f"{root}/_lineage/snapshot={k}.json", "w") as f:
        json.dump(body, f)


def test_needs_schema_merge_skips_tombstones(spark, tmp_path):
    """A tombstone squash records no schema — it also contributes no data
    paths, so it must not force mergeSchema forever after."""
    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    schema = [["subj", "string"], ["pred", "string"]]
    _write_lineage(root, 1, {"tombstone": True, "squashed_ids": [0, 1]})
    _write_lineage(root, 2, {"schema": schema})
    _write_lineage(root, 3, {"schema": schema})
    assert t._needs_schema_merge([1, 2, 3]) is False


def test_needs_schema_merge_order_insensitive(spark, tmp_path):
    """Identical column sets in different order (append vs squash
    read-back) must not trigger the all-footers mergeSchema scan."""
    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    _write_lineage(
        root, 1, {"schema": [["subj", "string"], ["pred", "string"]]}
    )
    _write_lineage(
        root, 2, {"schema": [["pred", "string"], ["subj", "string"]]}
    )
    assert t._needs_schema_merge([1, 2]) is False
    # genuine disagreement still forces the merge
    _write_lineage(
        root, 3, {"schema": [["subj", "string"], ["score", "double"]]}
    )
    assert t._needs_schema_merge([1, 2, 3]) is True
    # pre-schema-recording snapshot (no schema key, not a tombstone)
    _write_lineage(root, 4, {"n_rows": 5})
    assert t._needs_schema_merge([1, 2, 4]) is True


def test_tombstone_squash_end_to_end(spark, tmp_path):
    """Squash a fully-deleted range, then verify later loads do not pay
    mergeSchema: the tombstone lineage is skipped by the gate."""
    root = str(tmp_path / "kg")
    t = SnapshotTable(spark, root)
    df = spark.createDataFrame(
        [("a", "p", "b", None, "http://a")],
        "subj string, pred string, obj string, prov string, url string",
    )
    for _ in range(3):
        t.append(df)
    t.delete_where(F.lit(True))  # empty every snapshot
    t.append(df)  # one live snapshot on top
    t.squash_snapshots(keep_last=1)
    snaps = t.snapshots()
    assert t._needs_schema_merge(snaps) is False
    out = t.load()
    assert out is not None and out.count() == 1


# -- SPARQL LOAD: format mismatch surfaces ----------------------------------

def _kg(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "kg"))
    t.append(
        spark.createDataFrame(
            [("alice", "knows", "bob", None, "http://a")],
            "subj string, pred string, obj string, prov string, url string",
        )
    )
    return t


def test_load_format_mismatch_raises(spark, tmp_path):
    """Turtle content named .nt parses zero lines under the N-Triples
    regex — that must be an error, not a silent empty commit."""
    from search_spark.io.ntriples import write_turtle

    src = spark.createDataFrame(
        [("x", "p", "1"), ("x", "p", "2")],
        "subj string, pred string, obj string",
    )
    write_turtle(src, str(tmp_path / "doc.nt"))  # wrong suffix on purpose
    t = _kg(spark, tmp_path)
    with pytest.raises(SparqlError, match="0 quads"):
        sparql_update(t, f"LOAD <file://{tmp_path}/doc.nt>")
    # nothing was committed
    assert t.load().count() == 1


def test_load_format_mismatch_silent(spark, tmp_path):
    from search_spark.io.ntriples import write_turtle

    # multi-object rows so write_turtle emits abbreviated (predicate-list)
    # syntax that the N-Triples regex cannot parse — a one-line Turtle doc
    # would be valid N-Triples too (Turtle is a superset)
    src = spark.createDataFrame(
        [("x", "p", "1"), ("x", "p", "2"), ("x", "q", "3")],
        "subj string, pred string, obj string",
    )
    write_turtle(src, str(tmp_path / "doc.nt"))
    t = _kg(spark, tmp_path)
    res = sparql_update(t, f"LOAD SILENT <file://{tmp_path}/doc.nt>")
    assert res["op"] == "load" and res["n_rows"] == 0
    assert "0 quads" in res.get("error", "")


def test_load_genuinely_empty_file_ok(spark, tmp_path):
    """A zero-byte source is a legitimate empty document: no error."""
    p = tmp_path / "empty.nt"
    p.write_text("")
    t = _kg(spark, tmp_path)
    res = sparql_update(t, f"LOAD <file://{p}>")
    assert res["op"] == "load" and res["n_rows"] == 0
