"""SPARQL UPDATE over SnapshotTable (operators/sparql.py sparql_update)
plus GRAPH-scoped SELECT over the quad model (prov = graph label)."""

import pytest

from search_spark.io.snapshots import SnapshotTable
from search_spark.operators.sparql import (
    SparqlError,
    sparql_select,
    sparql_update,
)


def _table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "kg"))
    base = spark.createDataFrame(
        [
            ("alice", "knows", "bob", "g1", "http://a"),
            ("bob", "knows", "carol", "g1", "http://b"),
            ("alice", "type", "Person", "g2", "http://a"),
        ],
        "subj string, pred string, obj string, prov string, url string",
    )
    t.append(base)
    return t


def _rows(t):
    return sorted(
        (r.subj, r.pred, r.obj, r.prov)
        for r in t.load().select("subj", "pred", "obj", "prov").collect()
    )


def test_insert_data_appends_snapshot(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(
        t, 'INSERT DATA { <carol> <type> "Robot" . <dan> <type> "Person" . }'
    )
    assert res["op"] == "insert_data" and res["n_rows"] == 2
    assert res["snapshot_id"] == 2
    rows = _rows(t)
    # default-graph inserts carry NULL prov (N-Triples, not N-Quads, on
    # export) and the urn:sparql:update bucketing url
    assert ("carol", "type", "Robot", None) in rows
    assert len(rows) == 5
    urls = {
        r.url for r in t.load().filter("subj IN ('carol', 'dan')").collect()
    }
    assert urls == {"urn:sparql:update"}


def test_insert_data_graph_sets_prov(spark, tmp_path):
    t = _table(spark, tmp_path)
    sparql_update(
        t, "INSERT DATA { GRAPH <g9> { <x> <p> <y> . <x> <p> <z> . } }"
    )
    rows = _rows(t)
    assert ("x", "p", "y", "g9") in rows and ("x", "p", "z", "g9") in rows
    # bucketing url is the graph label
    urls = {r.url for r in t.load().filter("prov = 'g9'").collect()}
    assert urls == {"g9"}


def test_delete_data_exact_triples(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "DELETE DATA { <alice> <knows> <bob> . }")
    assert res == {"op": "delete_data", "n_deleted": 1}
    assert ("alice", "knows", "bob", "g1") not in _rows(t)
    assert len(_rows(t)) == 2


def test_delete_data_wrong_graph_deletes_nothing(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(
        t, "DELETE DATA { GRAPH <g2> { <alice> <knows> <bob> . } }"
    )
    assert res["n_deleted"] == 0
    assert len(_rows(t)) == 3


def test_delete_where_pattern(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "DELETE WHERE { ?s <knows> ?o . }")
    assert res == {"op": "delete_where", "n_deleted": 2}
    assert _rows(t) == [("alice", "type", "Person", "g2")]


def test_delete_where_graph_scoped(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "DELETE WHERE { GRAPH <g1> { ?s ?p ?o . } }")
    assert res["n_deleted"] == 2
    assert _rows(t) == [("alice", "type", "Person", "g2")]


def test_delete_where_multi_pattern_join(spark, tmp_path):
    """DELETE WHERE { P1 . P2 } expands to DELETE { P1 . P2 } WHERE
    { P1 . P2 } (SPARQL 1.1 Update §3.1.3) — join semantics: only the
    chain's own triples go."""
    t = _table(spark, tmp_path)
    res = sparql_update(
        t, "DELETE WHERE { ?a <knows> ?b . ?b <knows> ?c . }"
    )
    # the alice→bob→carol chain instantiates both patterns; the type
    # triple survives
    assert res["op"] == "modify" and res["n_deleted"] == 2
    assert _rows(t) == [("alice", "type", "Person", "g2")]


def test_modify_delete_insert(spark, tmp_path):
    """Full modify form: WHERE evaluates once against the pre-update
    store; deletes apply before inserts."""
    t = _table(spark, tmp_path)
    res = sparql_update(
        t,
        "DELETE { ?s <knows> ?o . } INSERT { ?o <knownBy> ?s . } "
        "WHERE { ?s <knows> ?o . }",
    )
    assert res["n_deleted"] == 2 and res["n_rows"] == 2
    rows = _rows(t)
    assert ("bob", "knownBy", "alice", None) in rows
    assert ("carol", "knownBy", "bob", None) in rows
    assert not [r for r in rows if r[1] == "knows"]
    assert len(rows) == 3  # 2 inserted + the untouched type triple


def test_modify_delete_matches_across_graphs(spark, tmp_path):
    """Templated deletes match (subj, pred, obj) across all graphs —
    the default-graph view is the union of the store's quads."""
    t = _table(spark, tmp_path)
    res = sparql_update(
        t,
        'DELETE { ?s <type> "Person" . } WHERE { ?s <knows> ?o . }'
    )
    # alice knows bob -> (alice, type, Person) goes even though its
    # prov is g2; bob has no type triple so nothing else matches
    assert res["n_deleted"] == 1
    assert not [r for r in _rows(t) if r[1] == "type"]


def test_modify_empty_where_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    snaps_before = t.snapshots()
    res = sparql_update(
        t,
        "DELETE { ?s <knows> ?o . } INSERT { ?s <met> ?o . } "
        "WHERE { ?s <nosuchpred> ?o . }",
    )
    assert res == {"op": "modify", "n_deleted": 0, "n_rows": 0,
                   "snapshot_id": None}
    assert len(_rows(t)) == 3
    assert t.snapshots() == snaps_before  # no empty snapshot committed


def test_insert_where_empty_bindings_no_snapshot(spark, tmp_path):
    t = _table(spark, tmp_path)
    snaps_before = t.snapshots()
    res = sparql_update(
        t, "INSERT { ?s <met> ?o . } WHERE { ?s <nosuchpred> ?o . }"
    )
    assert res == {"op": "insert_where", "n_rows": 0, "snapshot_id": None}
    assert t.snapshots() == snaps_before


def test_modify_with_filter_group(spark, tmp_path):
    """The WHERE group keeps the full SELECT surface (FILTER here)."""
    t = _table(spark, tmp_path)
    res = sparql_update(
        t,
        'DELETE { ?s <knows> ?o . } WHERE '
        '{ ?s <knows> ?o . FILTER(?s = "alice") }',
    )
    assert res["n_deleted"] == 1
    rows = _rows(t)
    assert ("bob", "knows", "carol", "g1") in rows
    assert ("alice", "knows", "bob", "g1") not in rows


def test_insert_where_template(spark, tmp_path):
    t = _table(spark, tmp_path)
    # derive symmetric edges for every <knows> pair
    res = sparql_update(
        t,
        "INSERT { ?b <known_by> ?a . ?a <has_contact> ?b . } "
        "WHERE { ?a <knows> ?b . }",
    )
    assert res["op"] == "insert_where" and res["n_rows"] == 4
    rows = _rows(t)
    assert ("bob", "known_by", "alice", None) in rows
    assert ("carol", "known_by", "bob", None) in rows
    assert ("alice", "has_contact", "bob", None) in rows
    assert len(rows) == 7
    urls = {
        r.url for r in t.load().filter("pred = 'known_by'").collect()
    }
    assert urls == {"urn:sparql:update"}


def test_insert_where_with_filter_and_constant(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(
        t,
        'INSERT { ?a <flagged> "yes" . } '
        'WHERE { ?a <knows> ?b . FILTER(STRSTARTS(?a, "a")) }',
    )
    assert res["n_rows"] == 1
    assert ("alice", "flagged", "yes", None) in _rows(t)


def test_insert_where_path_template_rejected(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(SparqlError):
        sparql_update(
            t, "INSERT { ?a <p>+ ?b . } WHERE { ?a <knows> ?b . }"
        )


def test_clear_graph(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "CLEAR GRAPH <g1>")
    assert res == {"op": "clear_graph", "n_deleted": 2}
    rows = _rows(t)
    assert rows == [("alice", "type", "Person", "g2")]


def test_update_round_trip_with_select(spark, tmp_path):
    t = _table(spark, tmp_path)
    sparql_update(t, 'INSERT DATA { GRAPH <g1> { <carol> <knows> "dan" . } }')
    out = sparql_select(
        t.load(),
        "SELECT ?a ?b WHERE { GRAPH <g1> { ?a <knows> ?b . } } ORDER BY ?a",
    )
    assert [(r.a, r.b) for r in out.collect()] == [
        ("alice", "bob"), ("bob", "carol"), ("carol", "dan")
    ]


def test_graph_select_filters_prov(spark, tmp_path):
    t = _table(spark, tmp_path)
    out = sparql_select(
        t.load(), "SELECT ?a WHERE { GRAPH <g2> { ?a ?p ?o . } }"
    )
    assert [r.a for r in out.collect()] == ["alice"]


@pytest.mark.parametrize(
    "bad",
    [
        "INSERT DATA { ?v <p> <o> . }",  # variable in DATA
        "DELETE WHERE { ?s <p>/<q> ?o . }",  # property path
        "DELETE { ?s <p>/<q> ?o . } WHERE { ?s <p> ?o . }",  # path in tpl
        "DELETE { ?s <p> ?x . } WHERE { ?s <p> ?o . }",  # unbound tpl var
        "DELETE { } WHERE { ?s <p> ?o . }",  # empty delete template
        "DELETE WHERE { GRAPH <g1> { ?s <p> ?o . ?o <q> ?r . } }",  # graph+multi
        "CLEAR GRAPH ?g",  # variable graph
        "LOAD <http://x>",  # unsupported form
        "INSERT DATA { }",  # empty
        "INSERT { } WHERE { ?s <p> ?o . }",  # empty template
    ],
)
def test_update_rejects(spark, tmp_path, bad):
    t = _table(spark, tmp_path)
    with pytest.raises(SparqlError):
        sparql_update(t, bad)


def test_cli_sparql_update_round_trip(spark, tmp_path):
    """cli.py sparql dispatches UPDATE forms: INSERT DATA commits a new
    snapshot (JSON result line), and a follow-up SELECT sees the row."""
    import json
    import os
    import subprocess
    import sys

    t = _table(spark, tmp_path)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    ins = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", t.root,
         "--query", 'INSERT DATA { GRAPH <g1> { <zed> <knows> "alice" . } }'],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert ins.returncode == 0, ins.stderr[-2000:]
    res = json.loads(ins.stdout.strip().splitlines()[-1])
    assert res["op"] == "insert_data" and res["n_rows"] == 1

    sel = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", t.root,
         "--query", "SELECT ?o WHERE { <zed> <knows> ?o . }"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert sel.returncode == 0, sel.stderr[-2000:]
    lines = [ln for ln in sel.stdout.splitlines() if ln]
    assert lines == ["o", "alice"]


def test_cli_sparql_explain_prints_plan(spark, tmp_path):
    """--explain prints the formatted physical plan without executing."""
    import os
    import subprocess
    import sys

    t = _table(spark, tmp_path)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", t.root, "--explain",
         "--query", "SELECT ?s ?o WHERE { ?s <knows> ?o . }"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Physical Plan" in out.stdout
    assert "s,o" not in out.stdout  # no result rows — plan only


def test_modify_random_vs_python_mirror(spark, tmp_path):
    """Seeded randomized parity for the modify form: random stores +
    random DELETE/INSERT templates over a random chain WHERE, vs a
    pure-Python mirror (bindings join, template instantiation,
    delete-then-insert ordering). Compares the post-update store as a
    set of (subj, pred, obj)."""
    import random

    rng = random.Random(20260819)
    nodes = [f"n{i}" for i in range(8)]
    preds = ["pa", "pb", "pc"]

    def eval_patterns(triples, patterns):
        binds = [{}]
        for s, p, o in patterns:
            new = []
            for b in binds:
                for ts, tp, to in triples:
                    m = dict(b)
                    ok = True
                    for term, val in ((s, ts), (p, tp), (o, to)):
                        if term.startswith("?"):
                            k = term[1:]
                            if k in m and m[k] != val:
                                ok = False
                                break
                            m[k] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        new.append(m)
            binds = new
        return binds

    def gen_chain(rng):
        n = rng.randint(1, 2)
        patterns = []
        subj = "?v0"
        for i in range(n):
            obj = (rng.choice(nodes) if rng.random() < 0.25
                   else f"?v{i + 1}")
            patterns.append((subj, rng.choice(preds), obj))
            subj = obj if obj.startswith("?") else "?v0"
        return patterns

    def render(pats):
        def t(x):
            return x if x.startswith("?") else f'"{x}"'
        return " ".join(f"{t(s)} <{p}> {t(o)} ." for s, p, o in pats)

    def gen_template(rng, variables, k):
        out = []
        for _ in range(k):
            s = (f"?{rng.choice(variables)}" if rng.random() < 0.8
                 else rng.choice(nodes))
            o = (f"?{rng.choice(variables)}" if rng.random() < 0.8
                 else rng.choice(nodes))
            out.append((s, rng.choice(preds + ["derived"]), o))
        return out

    def instantiate(bindings, template):
        out = set()
        for b in bindings:
            for s, p, o in template:
                sv = b[s[1:]] if s.startswith("?") else s
                ov = b[o[1:]] if o.startswith("?") else o
                out.add((sv, p, ov))
        return out

    for case in range(5):
        base = sorted({
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(40)
        })
        t = SnapshotTable(spark, str(tmp_path / f"kg{case}"))
        t.append(spark.createDataFrame(
            [(s, p, o, "g", f"http://{s}") for s, p, o in base],
            "subj string, pred string, obj string, prov string, url string",
        ))
        where = gen_chain(rng)
        variables = sorted({x[1:] for pt in where for x in pt
                            if x.startswith("?")})
        del_tpl = gen_template(rng, variables, rng.randint(1, 2))
        ins_tpl = (gen_template(rng, variables, 1)
                   if rng.random() < 0.7 else None)
        upd = f"DELETE {{ {render(del_tpl)} }} "
        if ins_tpl is not None:
            upd += f"INSERT {{ {render(ins_tpl)} }} "
        upd += f"WHERE {{ {render(where)} }}"

        bindings = eval_patterns(base, where)
        doomed = instantiate(bindings, del_tpl)
        inserted = (instantiate(bindings, ins_tpl)
                    if ins_tpl is not None else set())
        expected = (set(base) - doomed) | inserted

        res = sparql_update(t, upd)
        got = {(r.subj, r.pred, r.obj)
               for r in (t.load() or spark.createDataFrame(
                   [], "subj string, pred string, obj string")).collect()}
        assert got == expected, f"case {case}: {upd}\nres={res}"


def test_cli_sparql_json_format(spark, tmp_path):
    """--format json emits the W3C SPARQL 1.1 Results JSON document."""
    import json
    import os
    import subprocess
    import sys

    t = _table(spark, tmp_path)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", t.root, "--format", "json",
         "--query", "SELECT ?o WHERE { <alice> <knows> ?o . }"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    assert doc["head"] == {"vars": ["o"]}
    assert doc["results"]["bindings"] == [
        {"o": {"type": "literal", "value": "bob"}}
    ]


def test_add_graph(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "ADD GRAPH <g1> TO GRAPH <g2>")
    assert res["op"] == "add_graph" and res["n_rows"] == 2
    rows = _rows(t)
    assert ("alice", "knows", "bob", "g2") in rows
    assert ("bob", "knows", "carol", "g2") in rows
    assert ("alice", "knows", "bob", "g1") in rows  # source untouched
    assert len(rows) == 5


def test_copy_graph_clears_destination(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "COPY <g1> TO <g2>")
    assert res["n_rows"] == 2 and res["n_deleted"] == 1
    rows = _rows(t)
    assert ("alice", "type", "Person", "g2") not in rows  # old g2 gone
    assert ("alice", "knows", "bob", "g2") in rows
    assert ("alice", "knows", "bob", "g1") in rows
    assert len(rows) == 4


def test_move_graph(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "MOVE <g1> TO <g2>")
    assert res["n_rows"] == 2 and res["n_deleted"] == 3  # old g2 + src g1
    rows = _rows(t)
    assert rows == [
        ("alice", "knows", "bob", "g2"),
        ("bob", "knows", "carol", "g2"),
    ]


def test_add_graph_to_default(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "ADD <g2> TO DEFAULT")
    assert res["n_rows"] == 1
    rows = {
        (r.subj, r.pred, r.obj, r.prov)
        for r in t.load().select("subj", "pred", "obj", "prov").collect()
    }
    assert ("alice", "type", "Person", None) in rows
    assert ("alice", "type", "Person", "g2") in rows  # source untouched


def test_copy_graph_same_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "COPY <g1> TO <g1>")
    assert res == {"op": "copy_graph", "n_rows": 0, "n_deleted": 0,
                   "snapshot_id": None}
    assert len(_rows(t)) == 3


def test_clear_default_named_all_and_drop(spark, tmp_path):
    t = _table(spark, tmp_path)
    sparql_update(t, 'INSERT DATA { <x> <p> "y" . }')  # NULL-prov row
    res = sparql_update(t, "CLEAR DEFAULT")
    assert res == {"op": "clear_default", "n_deleted": 1}
    res = sparql_update(t, "DROP GRAPH <g2>")
    assert res == {"op": "drop_graph", "n_deleted": 1}
    res = sparql_update(t, "CLEAR NAMED")
    assert res == {"op": "clear_named", "n_deleted": 2}
    t2 = _table(spark, tmp_path / "b")
    res = sparql_update(t2, "CLEAR ALL")
    assert res == {"op": "clear_all", "n_deleted": 3}
    assert t2.load() is None or t2.load().count() == 0


def test_create_graph_is_validated_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = _rows(t)
    res = sparql_update(t, "CREATE GRAPH <g9>")
    assert res == {"op": "create_graph", "graph": "g9", "n_rows": 0}
    res2 = sparql_update(t, "CREATE SILENT GRAPH <g9>")
    assert res2["graph"] == "g9"
    assert _rows(t) == before  # no snapshot written
    with pytest.raises(SparqlError, match="constant graph"):
        sparql_update(t, "CREATE GRAPH ?g")


def test_silent_tolerated_on_clear_drop_and_management(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "CLEAR SILENT GRAPH <g2>")
    assert res["n_deleted"] == 1
    res2 = sparql_update(t, "ADD SILENT GRAPH <g1> TO GRAPH <g3>")
    assert res2["n_rows"] == 2
    res3 = sparql_update(t, "DROP SILENT GRAPH <g3>")
    assert res3["n_deleted"] == 2
    assert _rows(t) == [
        ("alice", "knows", "bob", "g1"),
        ("bob", "knows", "carol", "g1"),
    ]


def test_graph_var_select_over_snapshot(spark, tmp_path):
    # the quad model end-to-end: GRAPH ?g over a loaded SnapshotTable
    t = _table(spark, tmp_path)
    out = sparql_select(
        t.load(),
        "SELECT DISTINCT ?g ?x WHERE { GRAPH ?g { ?x <knows> ?y } } "
        "ORDER BY ?g ?x",
    )
    assert [tuple(r) for r in out.collect()] == [
        ("g1", "alice"), ("g1", "bob")
    ]


def test_with_modify_confined_to_graph(spark, tmp_path):
    # WITH <g1>: WHERE matches within g1 as default graph; the delete
    # and insert both target g1 only (g2's rows untouched)
    t = _table(spark, tmp_path)
    res = sparql_update(
        t,
        "WITH <g1> DELETE { ?s <knows> ?o } INSERT { ?o <knownBy> ?s } "
        "WHERE { ?s <knows> ?o }",
    )
    assert res["n_deleted"] == 2 and res["n_rows"] == 2
    assert _rows(t) == [
        ("alice", "type", "Person", "g2"),
        ("bob", "knownBy", "alice", "g1"),
        ("carol", "knownBy", "bob", "g1"),
    ]


def test_with_delete_does_not_touch_other_graphs(spark, tmp_path):
    # the same (s,p,o) exists in g1 and g2; WITH <g1> deletes only g1's
    t = _table(spark, tmp_path)
    t.append(spark.createDataFrame(
        [("alice", "knows", "bob", "g2", "http://a")],
        "subj string, pred string, obj string, prov string, url string",
    ))
    res = sparql_update(
        t, 'WITH <g1> DELETE { ?s <knows> "bob" } WHERE { ?s <knows> "bob" }'
    )
    assert res["n_deleted"] == 1
    assert ("alice", "knows", "bob", "g2") in _rows(t)
    assert ("alice", "knows", "bob", "g1") not in _rows(t)


def test_using_overrides_with_for_where(spark, tmp_path):
    # USING <g2> builds the WHERE dataset; WITH <g1> still scopes the
    # delete — ?s binds alice via g2's type row, delete hits g1
    t = _table(spark, tmp_path)
    res = sparql_update(
        t,
        "WITH <g1> DELETE { ?s <knows> ?o } USING <g2> "
        'WHERE { ?s <type> "Person" . ?s <knows> ?o }',
    )
    # g2 has no knows rows: the join over the USING dataset is empty
    assert res["n_deleted"] == 0
    res2 = sparql_update(
        t,
        "WITH <g1> DELETE { ?s <knows> ?o } USING <g1> "
        "WHERE { ?s <knows> ?o }",
    )
    assert res2["n_deleted"] == 2


def test_using_named_scopes_graph_blocks(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(
        t,
        "DELETE { ?s <knows> ?o } USING NAMED <g1> "
        "WHERE { GRAPH ?g { ?s <knows> ?o } }",
    )
    # deletes match (s,p,o) across graphs when no WITH is given
    assert res["n_deleted"] == 2
    assert _rows(t) == [("alice", "type", "Person", "g2")]


def test_with_insert_where_lands_in_graph(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(
        t, 'WITH <g2> INSERT { ?s <checked> "y" } WHERE { ?s <type> ?t }'
    )
    assert res["n_rows"] == 1
    assert ("alice", "checked", "y", "g2") in _rows(t)


@pytest.mark.parametrize("bad", [
    'WITH <g1> INSERT DATA { <x> <y> "z" }',
    'WITH <g1> DELETE DATA { <x> <y> "z" }',
    'WITH <g1> DELETE WHERE { ?s <p> ?o }',
    'WITH ?g DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }',
    'DELETE { ?s <p> ?o } USING ?g WHERE { ?s <p> ?o }',
])
def test_with_using_rejects(spark, tmp_path, bad):
    t = _table(spark, tmp_path)
    with pytest.raises(SparqlError):
        sparql_update(t, bad)


def test_load_ntriples_file(spark, tmp_path):
    from search_spark.io.ntriples import write_ntriples

    src = spark.createDataFrame(
        [("x", "p", "1", "gA"), ("y", "p", "2", None)],
        "subj string, pred string, obj string, prov string",
    )
    write_ntriples(src, str(tmp_path / "doc.nt"))
    t = _table(spark, tmp_path)
    res = sparql_update(t, f"LOAD <file://{tmp_path}/doc.nt>")
    assert res["op"] == "load" and res["n_rows"] == 2
    rows = _rows(t)
    # quads keep their own labels; default-graph triples stay NULL
    assert ("x", "p", "1", "gA") in rows and ("y", "p", "2", None) in rows


def test_load_into_graph_overrides_labels(spark, tmp_path):
    from search_spark.io.ntriples import write_ntriples

    src = spark.createDataFrame(
        [("x", "p", "1", "gA"), ("y", "p", "2", None)],
        "subj string, pred string, obj string, prov string",
    )
    write_ntriples(src, str(tmp_path / "doc.nt"))
    t = _table(spark, tmp_path)
    res = sparql_update(
        t, f"LOAD <file://{tmp_path}/doc.nt> INTO GRAPH <g9>"
    )
    assert res["n_rows"] == 2
    assert {r for r in _rows(t) if r[0] in ("x", "y")} == {
        ("x", "p", "1", "g9"), ("y", "p", "2", "g9"),
    }


def test_load_silent_swallows_missing_file(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = sparql_update(t, "LOAD SILENT <file:///no/such/file.nt>")
    assert res["op"] == "load" and res["n_rows"] == 0
    with pytest.raises(SparqlError, match="LOAD failed"):
        sparql_update(t, "LOAD <file:///no/such/file.nt>")


def test_load_turtle_file(spark, tmp_path):
    from search_spark.io.ntriples import write_turtle

    src = spark.createDataFrame(
        [("x", "p", "1"), ("x", "p", "2"), ("y", "q", "3")],
        "subj string, pred string, obj string",
    )
    write_turtle(src, str(tmp_path / "doc.ttl"))
    t = _table(spark, tmp_path)
    res = sparql_update(t, f"LOAD <file://{tmp_path}/doc.ttl>")
    assert res["op"] == "load" and res["n_rows"] == 3
    rows = _rows(t)
    # Turtle carries no graph term: everything lands in the default graph
    assert ("x", "p", "1", None) in rows
    assert ("x", "p", "2", None) in rows
    assert ("y", "q", "3", None) in rows


def test_load_turtle_into_graph(spark, tmp_path):
    from search_spark.io.ntriples import write_turtle

    src = spark.createDataFrame(
        [("x", "p", "1")], "subj string, pred string, obj string"
    )
    write_turtle(src, str(tmp_path / "doc2.ttl"))
    t = _table(spark, tmp_path)
    sparql_update(t, f"LOAD <file://{tmp_path}/doc2.ttl> INTO GRAPH <g9>")
    assert ("x", "p", "1", "g9") in _rows(t)


def test_cli_sparql_construct_ttl_output(spark, tmp_path):
    """--format ttl serializes a CONSTRUCT-shaped result as Turtle
    subject blocks; --format nt as N-Triples lines."""
    import os
    import subprocess
    import sys

    t = _table(spark, tmp_path)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", t.root, "--format", "ttl",
         "--query", "CONSTRUCT WHERE { ?s <knows> ?o . }"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "<kg:pred/knows>" in out.stdout and " ." in out.stdout

    nt = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", t.root, "--format", "nt",
         "--query", "CONSTRUCT WHERE { ?s <knows> ?o . }"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert nt.returncode == 0, nt.stderr[-2000:]
    lines = [ln for ln in nt.stdout.splitlines() if ln.startswith("<")]
    assert lines and all(ln.endswith(" .") for ln in lines)
