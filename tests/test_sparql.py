"""SPARQL SELECT compiler (operators/sparql.py) — parser unit tests plus
DataFrame-level semantics against hand-computed bindings."""

import pytest

from search_spark.operators.sparql import SparqlError, parse_select, sparql_select


def test_parse_basic():
    q = parse_select(
        'SELECT ?a ?b WHERE { ?a <knows> ?b . ?b <type> "Person" . }'
    )
    assert q["select"] == ["a", "b"]
    assert q["patterns"] == [("?a", "knows", "?b"), ("?b", "type", "Person")]
    assert not q["distinct"] and q["limit"] is None


def test_parse_optional_not_exists_order_limit():
    q = parse_select(
        "SELECT DISTINCT ?a ?n WHERE { ?a <type> Person . "
        "OPTIONAL { ?a <name> ?n . } "
        "FILTER NOT EXISTS { ?a <banned> ?x . } } "
        "ORDER BY DESC(?a) ?n LIMIT 5"
    )
    assert q["distinct"] is True
    assert q["optional"] == [("?a", "name", "?n")]
    assert q["not_exists"] == [("?a", "banned", "?x")]
    assert q["order"] == [("a", True), ("n", False)]
    assert q["limit"] == 5


def test_parse_filter_not_iri_confusion():
    # `< ?b` inside FILTER must lex as comparison, not as an IRI
    q = parse_select(
        "SELECT ?a WHERE { ?a <p> ?b . FILTER(?a < ?b && ?b != ?a) }"
    )
    assert len(q["filters"]) == 1


def test_parse_literal_escapes():
    q = parse_select(r'SELECT ?a WHERE { ?a <says> "he said \"hi\"" . }')
    assert q["patterns"][0][2] == 'he said "hi"'


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT WHERE { ?a <p> ?b . }",
        "SELECT ?a { ?a <p> ?b . }",  # missing WHERE
        "SELECT ?a WHERE { }",
        "SELECT ?a WHERE { ?a <p> ?b . FILTER(?a ~ ?b) }",
        "SELECT ?a WHERE { ?a <p> ?b ",
    ],
)
def test_parse_rejects(bad):
    with pytest.raises(SparqlError):
        parse_select(bad)


def test_unbound_select_var_raises_at_compile(spark):
    with pytest.raises(SparqlError):
        sparql_select(_triples(spark), "SELECT ?zzz WHERE { ?a <p> ?b . }")


def _triples(spark):
    rows = [
        ("alice", "knows", "bob"),
        ("alice", "knows", "carol"),
        ("bob", "knows", "carol"),
        ("alice", "type", "Person"),
        ("bob", "type", "Person"),
        ("carol", "type", "Robot"),
        ("bob", "name", "Bobby"),
        ("carol", "banned", "spam"),
        # duplicate provenance row — set semantics must collapse it
        ("alice", "knows", "bob"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_select_basic(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> "Person" . } ORDER BY ?a',
    )
    assert [r.a for r in out.collect()] == ["alice", "bob"]


def test_select_join_filter(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?b WHERE { ?a <knows> ?b . ?b <type> Person . "
        "FILTER(?a != ?b) }",
    )
    assert sorted((r.a, r.b) for r in out.collect()) == [("alice", "bob")]


def test_select_optional_and_not_exists(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?n WHERE { ?a <type> ?t . "
        "OPTIONAL { ?a <name> ?n . } "
        "FILTER NOT EXISTS { ?a <banned> ?x . } } ORDER BY ?a",
    )
    got = [(r.a, r.n) for r in out.collect()]
    assert got == [("alice", None), ("bob", "Bobby")]


def test_select_distinct_projection(spark):
    # both alice and bob are Person; projecting ?t with DISTINCT → one row
    out = sparql_select(
        _triples(spark),
        'SELECT DISTINCT ?t WHERE { ?a <type> ?t . ?a <knows> ?b . }',
    )
    assert [r.t for r in out.collect()] == ["Person"]


def test_select_limit_orderby(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?b WHERE { ?a <knows> ?b . } ORDER BY DESC(?b) LIMIT 1",
    )
    assert [r.b for r in out.collect()] == ["carol"]


def test_disconnected_bgp_raises(spark):
    with pytest.raises(ValueError):
        sparql_select(
            _triples(spark),
            "SELECT ?a ?c WHERE { ?a <knows> ?b . ?c <banned> ?d . }",
        ).collect()


def test_construct_templated_triples(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(
        _triples(spark),
        "CONSTRUCT { ?b <known_by> ?a . ?a <rdf:type> <Knower> . } "
        "WHERE { ?a <knows> ?b . ?a <type> Person . FILTER(?a != ?b) }",
    )
    got = sorted((r.subj, r.pred, r.obj) for r in out.collect())
    assert got == sorted(
        [
            ("bob", "known_by", "alice"),
            ("carol", "known_by", "alice"),
            ("carol", "known_by", "bob"),
            ("alice", "rdf:type", "Knower"),
            ("bob", "rdf:type", "Knower"),
        ]
    )


def test_ask_true_false(spark):
    from search_spark.operators.sparql import sparql_query

    assert sparql_query(_triples(spark), "ASK { ?a <banned> ?x . }") is True
    assert sparql_query(_triples(spark), "ASK { ?a <likes> ?x . }") is False


def test_describe_scans_resource(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(_triples(spark), "DESCRIBE <carol>")
    # alice-knows-carol, bob-knows-carol, carol-type-Robot, carol-banned-spam
    assert out.count() == 4


def test_unsupported_form_raises(spark):
    from search_spark.operators.sparql import SparqlError, sparql_query

    with pytest.raises(SparqlError):
        sparql_query(_triples(spark), "DELETE WHERE { ?a ?b ?c }")


def test_union_branch_local_var_is_null(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?n WHERE { "
        '{ ?a <type> "Robot" . } UNION { ?a <name> ?n . } } ORDER BY ?a',
    )
    rows = [(r.a, r.n) for r in out.collect()]
    assert rows == [("bob", "Bobby"), ("carol", None)]


def test_union_distinct_across_branches(spark):
    # alice satisfies both branches -> one output row (set semantics)
    out = sparql_select(
        _triples(spark),
        "SELECT ?a WHERE { "
        '{ ?a <knows> "bob" . } UNION { ?a <type> "Person" . FILTER(?a != "bob") . } }',
    )
    assert sorted(r.a for r in out.collect()) == ["alice"]


def test_values_single_var(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a ?b WHERE { ?a <knows> ?b . VALUES ?b { "bob" "dave" } }',
    )
    assert [(r.a, r.b) for r in out.collect()] == [("alice", "bob")]


def test_values_tuple_form(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?b WHERE { ?a <knows> ?b . "
        'VALUES (?a ?b) { ("alice" "carol") ("bob" "carol") ("bob" "zed") } }',
    )
    assert sorted((r.a, r.b) for r in out.collect()) == [
        ("alice", "carol"),
        ("bob", "carol"),
    ]


def test_values_unbound_var_raises(spark):
    with pytest.raises(SparqlError):
        sparql_select(
            _triples(spark),
            'SELECT ?a WHERE { ?a <knows> ?b . VALUES ?zzz { "x" } }',
        ).collect()


def test_aggregate_group_by(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (COUNT(?b) AS ?n) (MIN(?b) AS ?first) "
        "WHERE { ?a <knows> ?b . } GROUP BY ?a ORDER BY ?a",
    )
    rows = [(r.a, r.n, r.first) for r in out.collect()]
    # duplicate alice-knows-bob provenance row collapses (set semantics)
    assert rows == [("alice", 2, "bob"), ("bob", 1, "carol")]


def test_aggregate_global_count_star(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT (COUNT(*) AS ?n) WHERE { ?a <knows> ?b . }",
    )
    assert out.collect()[0].n == 3


def test_aggregate_count_skips_unbound(spark):
    # OPTIONAL name binds only for bob -> COUNT(?n) = 1 while COUNT(*) = 2
    out = sparql_select(
        _triples(spark),
        "SELECT (COUNT(*) AS ?rows) (COUNT(?n) AS ?named) WHERE { "
        '?a <type> "Person" . OPTIONAL { ?a <name> ?n . } }',
    )
    r = out.collect()[0]
    assert (r.rows, r.named) == (2, 1)


def test_aggregate_avg_nonnumeric_is_null(spark):
    # string terms try_cast to double -> NULL, not an ANSI abort
    out = sparql_select(
        _triples(spark),
        "SELECT (AVG(?b) AS ?m) WHERE { ?a <knows> ?b . }",
    )
    assert out.collect()[0].m is None


def test_ask_with_union(spark):
    from search_spark.operators.sparql import sparql_query

    assert sparql_query(
        _triples(spark),
        "ASK { { ?a <likes> ?x . } UNION { ?a <banned> ?x . } }",
    ) is True


def test_path_sequence(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?t WHERE { ?a <knows>/<type> ?t . } ORDER BY ?a ?t",
    )
    rows = [(r.a, r.t) for r in out.collect()]
    assert rows == [
        ("alice", "Person"),
        ("alice", "Robot"),
        ("bob", "Robot"),
    ]


def test_path_inverse_seeded_subject(spark):
    # constant subject seeds the flipped evaluation: who knows carol
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { "carol" ^<knows> ?a . } ORDER BY ?a',
    )
    assert [r.a for r in out.collect()] == ["alice", "bob"]


def test_path_alternation(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?x WHERE { "bob" <name>|<type> ?x . } ORDER BY ?x',
    )
    assert [r.x for r in out.collect()] == ["Bobby", "Person"]


def test_path_plus_transitive(spark):
    rows = [("a", "next", "b"), ("b", "next", "c"), ("c", "next", "d")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(t, 'SELECT ?x WHERE { "a" <next>+ ?x . } ORDER BY ?x')
    assert [r.x for r in out.collect()] == ["b", "c", "d"]


def test_path_bounded_repetition(spark):
    rows = [("a", "next", "b"), ("b", "next", "c"), ("c", "next", "d")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        t, 'SELECT ?x WHERE { "a" <next>{1,2} ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["b", "c"]


def test_path_constant_object_seeds_flip(spark):
    # ?x <knows>+ "carol" — evaluated as carol ^<knows>+ ?x, seeded
    out = sparql_select(
        _triples(spark),
        'SELECT ?x WHERE { ?x <knows>+ "carol" . } ORDER BY ?x',
    )
    assert [r.x for r in out.collect()] == ["alice", "bob"]


def test_path_joins_plain_pattern(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?t WHERE { ?a <knows>/<knows> ?c . ?a <type> ?t . }",
    )
    assert [(r.a, r.t) for r in out.collect()] == [("alice", "Person")]


def test_path_zero_or_more(spark):
    rows = [("a", "next", "b"), ("b", "next", "c"), ("x", "other", "y")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # seeded: zero-length matches the seed itself
    out = sparql_select(t, 'SELECT ?x WHERE { "a" <next>* ?x . } ORDER BY ?x')
    assert [r.x for r in out.collect()] == ["a", "b", "c"]
    # seeded at a node with no <next> edges: still matches itself
    out = sparql_select(t, 'SELECT ?x WHERE { "y" <next>* ?x . }')
    assert [r.x for r in out.collect()] == ["y"]
    # unseeded: zero-length binds every node of the graph
    out = sparql_select(
        t, "SELECT ?s ?x WHERE { ?s <next>* ?x . } ORDER BY ?s ?x"
    )
    got = [(r.s, r.x) for r in out.collect()]
    nodes = ["a", "b", "c", "x", "y"]
    expect = sorted(
        [(n, n) for n in nodes] + [("a", "b"), ("a", "c"), ("b", "c")]
    )
    assert got == expect


def test_path_zero_or_one(spark):
    rows = [("a", "next", "b"), ("b", "next", "c")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(t, 'SELECT ?x WHERE { "a" <next>? ?x . } ORDER BY ?x')
    assert [r.x for r in out.collect()] == ["a", "b"]
    # constant object seeds the flipped path; zero-length matches it too
    out = sparql_select(t, 'SELECT ?x WHERE { ?x <next>? "c" . } ORDER BY ?x')
    assert [r.x for r in out.collect()] == ["b", "c"]
    # explicit {0,k} spelling
    out = sparql_select(
        t, 'SELECT ?x WHERE { "a" <next>{0,2} ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["a", "b", "c"]


def test_path_star_composes(spark):
    rows = [("a", "p", "b"), ("b", "q", "c"), ("b", "q", "d")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # seq with a zero-capable tail: <p>/<q>* reaches b (zero q-steps)
    out = sparql_select(
        t, 'SELECT ?x WHERE { "a" <p>/<q>* ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["b", "c", "d"]


def test_path_negated_property_set(spark):
    rows = [
        ("a", "knows", "b"),
        ("a", "hates", "c"),
        ("a", "likes", "d"),
        ("e", "knows", "a"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # forward-only: one step over any predicate except <knows>
    out = sparql_select(t, 'SELECT ?x WHERE { "a" !<knows> ?x . } ORDER BY ?x')
    assert [r.x for r in out.collect()] == ["c", "d"]
    out = sparql_select(
        t, 'SELECT ?x WHERE { "a" !(<knows>|<hates>) ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["d"]
    # inverse-only branch: reversed edges whose predicate is not <likes>
    out = sparql_select(
        t, 'SELECT ?x WHERE { "a" !(^<likes>) ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["e"]
    # mixed: forward non-knows ∪ reversed non-likes
    out = sparql_select(
        t, 'SELECT ?x WHERE { "a" !(<knows>|^<likes>) ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["c", "d", "e"]
    # leading ^ flips the whole set: ^!<likes> == !(^<likes>)
    out = sparql_select(
        t, 'SELECT ?x WHERE { "a" ^!<likes> ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["e"]
    # modifiers compose: !<hates>+ walks non-hates edges transitively
    # (e -knows-> a -knows-> b, a -likes-> d; a -hates-> c is excluded)
    out = sparql_select(
        t, 'SELECT ?x WHERE { "e" !<hates>+ ?x . } ORDER BY ?x'
    )
    assert [r.x for r in out.collect()] == ["a", "b", "d"]


def test_aggregate_distinct_beyond_count(spark):
    # distinct subjects ?r keep duplicate ?x values alive under the
    # module's set semantics, so DISTINCT-in-aggregate is observable
    rows = [
        ("g1", "1"), ("g1", "1"), ("g1", "3"),
        ("g2", "5"),
    ]
    rows2 = []
    for i, (g, x) in enumerate(rows):
        rows2 += [(f"r{i}", "in_group", g), (f"r{i}", "val", x)]
    t = spark.createDataFrame(
        rows2, "subj string, pred string, obj string"
    )
    q = (
        "SELECT ?g (SUM(DISTINCT ?x) AS ?s) (AVG(DISTINCT ?x) AS ?a) "
        "(GROUP_CONCAT(DISTINCT ?x) AS ?c) WHERE { "
        "?r <in_group> ?g . ?r <val> ?x . } GROUP BY ?g ORDER BY ?g"
    )
    got = [(r.g, r.s, r.a, r.c) for r in sparql_select(t, q).collect()]
    assert got == [("g1", 4.0, 2.0, "1 3"), ("g2", 5.0, 5.0, "5")]


def test_filter_value_expressions(spark):
    rows = [
        ("a", "price", "10"), ("a", "qty", "3"),
        ("b", "price", "4"), ("b", "qty", "2"),
        ("c", "price", "x"), ("c", "qty", "9"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # arithmetic on both sides; non-numeric terms compare as NULL → drop
    out = sparql_select(
        t,
        "SELECT ?s WHERE { ?s <price> ?p . ?s <qty> ?q . "
        "FILTER(?p * ?q > 8 + 1) } ORDER BY ?s",
    )
    assert [r.s for r in out.collect()] == ["a"]
    # builtin inside the comparison
    out = sparql_select(
        t,
        "SELECT ?s WHERE { ?s <price> ?p . "
        "FILTER(STRLEN(?p) >= 2) } ORDER BY ?s",
    )
    assert [r.s for r in out.collect()] == ["a"]
    # HAVING shares the grammar: computed threshold over an agg alias
    out = sparql_select(
        t,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?pr ?o . } "
        "GROUP BY ?s HAVING(?n * 2 >= 4) ORDER BY ?s",
    )
    assert [(r.s, r.n) for r in out.collect()] == [
        ("a", 2), ("b", 2), ("c", 2)
    ]


def test_optional_group_with_property_path(spark):
    # a property path inside OPTIONAL compiles as a nested group and
    # left-joins the outer bindings; unreachable rows keep NULL
    rows = [
        ("a", "type", "T"), ("b", "type", "T"),
        ("a", "next", "m"), ("m", "next", "z"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        t,
        'SELECT ?s ?r WHERE { ?s <type> "T" . '
        "OPTIONAL { ?s <next>+ ?r . } } ORDER BY ?s ?r",
    )
    assert [(r.s, r.r) for r in out.collect()] == [
        ("a", "m"), ("a", "z"), ("b", None)
    ]


def test_path_rejects_bad_bounds_and_var(spark):
    with pytest.raises(SparqlError):
        parse_select("SELECT ?a WHERE { ?a <p>{2,5} ?b . }")
    with pytest.raises(SparqlError):
        parse_select("SELECT ?a WHERE { ?a <p>{1,0} ?b . }")
    with pytest.raises(SparqlError):
        parse_select("SELECT ?a WHERE { ?a <p>/?q ?b . }")
    with pytest.raises(SparqlError):
        parse_select('SELECT ?a WHERE { "x" <p>+ "y" . }')


# --- BIND / MINUS / OFFSET / FILTER builtins --------------------------------


def test_bind_ucase(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a ?u WHERE { ?a <type> "Person" . '
        "BIND(UCASE(?a) AS ?u) } ORDER BY ?a",
    )
    assert [(r.a, r.u) for r in out.collect()] == [
        ("alice", "ALICE"), ("bob", "BOB")
    ]


def test_bind_concat_then_filter_contains(spark):
    # FILTER sees the BIND variable (group-wide filter scope)
    out = sparql_select(
        _triples(spark),
        "SELECT ?k WHERE { ?a <type> ?t . "
        'BIND(CONCAT(?a, "-", ?t) AS ?k) '
        'FILTER(CONTAINS(?k, "ice-Per")) }',
    )
    assert [r.k for r in out.collect()] == ["alice-Person"]


def test_bind_nested_substr_strlen(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a ?s ?n WHERE { ?a <type> "Robot" . '
        "BIND(SUBSTR(UCASE(?a), 1, 3) AS ?s) "
        "BIND(STRLEN(?a) AS ?n) }",
    )
    assert [(r.a, r.s, r.n) for r in out.collect()] == [("carol", "CAR", 5)]


def test_bind_arithmetic_if_coalesce(spark):
    rows = [
        ("a", "price", "10"), ("a", "qty", "3"),
        ("b", "price", "x"), ("b", "qty", "2"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # precedence: 1 + qty * price = 31; non-numeric price → NULL
    out = sparql_select(
        t,
        "SELECT ?s ?v WHERE { ?s <price> ?p . ?s <qty> ?q . "
        "BIND(1 + ?q * ?p AS ?v) } ORDER BY ?s",
    )
    assert [(r.s, r.v) for r in out.collect()] == [("a", 31.0), ("b", None)]
    # parens override precedence; division is NULL-safe
    out = sparql_select(
        t,
        "SELECT ?v WHERE { ?s <price> ?p . ?s <qty> ?q . "
        'FILTER(?s = "a") BIND((?p + ?q) / 0 AS ?v) }',
    )
    assert [r.v for r in out.collect()] == [None]
    # IF over a comparison, COALESCE fills the non-numeric hole
    out = sparql_select(
        t,
        "SELECT ?s ?tag WHERE { ?s <qty> ?q . "
        'BIND(IF(?q > "2", "big", "small") AS ?tag) } ORDER BY ?s',
    )
    assert [(r.s, r.tag) for r in out.collect()] == [
        ("a", "big"), ("b", "small")
    ]
    out = sparql_select(
        t,
        "SELECT ?s ?n WHERE { ?s <price> ?p . "
        'BIND(COALESCE(?p * 1, "0") AS ?n) } ORDER BY ?s',
    )
    assert [(r.s, r.n) for r in out.collect()] == [("a", 10.0), ("b", 0.0)]


def test_bind_rebinding_raises(spark):
    with pytest.raises(SparqlError):
        sparql_select(
            _triples(spark),
            "SELECT ?a WHERE { ?a <knows> ?b . BIND(UCASE(?b) AS ?a) }",
        )


def test_minus_shared_var(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> "Person" . '
        "MINUS { ?a <name> ?n . } }",
    )
    assert [r.a for r in out.collect()] == ["alice"]


def test_minus_disjoint_removes_nothing(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> "Person" . '
        "MINUS { ?x <banned> ?y . } } ORDER BY ?a",
    )
    assert [r.a for r in out.collect()] == ["alice", "bob"]


def test_offset_after_order(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?b WHERE { ?a <knows> ?b . } ORDER BY ?a ?b "
        "OFFSET 1 LIMIT 2",
    )
    assert [(r.a, r.b) for r in out.collect()] == [
        ("alice", "carol"), ("bob", "carol")
    ]


def test_filter_bound_with_optional(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> "Person" . '
        "OPTIONAL { ?a <name> ?n . } FILTER(!BOUND(?n)) }",
    )
    assert [r.a for r in out.collect()] == ["alice"]


def test_filter_in_and_not_in(spark):
    t = _triples(spark)
    q = 'SELECT ?a WHERE { ?a <type> "Person" . FILTER(?a IN ("alice", "zed")) }'
    assert [r.a for r in sparql_select(t, q).collect()] == ["alice"]
    q2 = 'SELECT ?a WHERE { ?a <type> "Person" . FILTER(?a NOT IN ("alice")) }'
    assert [r.a for r in sparql_select(t, q2).collect()] == ["bob"]


def test_filter_strstarts_regex(spark):
    t = _triples(spark)
    q = 'SELECT ?a WHERE { ?a <type> ?t . FILTER(STRSTARTS(?a, "b")) }'
    assert [r.a for r in sparql_select(t, q).collect()] == ["bob"]
    q2 = 'SELECT ?a WHERE { ?a <type> ?t . FILTER(REGEX(?a, "^b.b$")) }'
    assert [r.a for r in sparql_select(t, q2).collect()] == ["bob"]


def test_filter_negated_contains_mixed_conj(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a WHERE { ?a <type> ?t . "
        'FILTER(!CONTAINS(?a, "o") && ?t = "Person") }',
    )
    assert [r.a for r in out.collect()] == ["alice"]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?a WHERE { ?a <p> ?b . FILTER(!?a = ?b) }",
        "SELECT ?a WHERE { ?a <p> ?b . FILTER(?a IN ()) }",
        "SELECT ?a WHERE { ?a <p> ?b . BIND(BOGUSFN(?a) AS ?c) }",
        "SELECT ?a WHERE { ?a <p> ?b . MINUS { } }",
        'SELECT ?a WHERE { ?a <p> ?b . FILTER(BOUND("x")) }',
    ],
)
def test_new_syntax_rejects(bad):
    with pytest.raises(SparqlError):
        parse_select(bad)


def test_filter_exists_semi_join(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> "Person" . '
        "FILTER EXISTS { ?a <name> ?n . } }",
    )
    assert [r.a for r in out.collect()] == ["bob"]


def test_filter_exists_disjoint_raises(spark):
    with pytest.raises(SparqlError):
        sparql_select(
            _triples(spark),
            'SELECT ?a WHERE { ?a <type> "Person" . '
            "FILTER EXISTS { ?x <banned> ?y . } }",
        ).collect()


def test_optional_full_group(spark):
    # multi-pattern OPTIONAL: both the name AND a knows edge must match
    # for the branch to bind; otherwise NULLs
    out = sparql_select(
        _triples(spark),
        'SELECT ?a ?n WHERE { ?a <type> "Person" . '
        "OPTIONAL { ?a <name> ?n . ?a <knows> ?c . } } ORDER BY ?a",
    )
    assert [(r.a, r.n) for r in out.collect()] == [
        ("alice", None), ("bob", "Bobby")
    ]


def test_optional_group_with_filter(spark):
    # a filter inside OPTIONAL scopes to the optional branch (its failure
    # unbinds the branch instead of dropping the outer row)
    out = sparql_select(
        _triples(spark),
        'SELECT ?a ?n WHERE { ?a <type> "Person" . '
        'OPTIONAL { ?a <name> ?n . FILTER(STRSTARTS(?n, "Z")) } } '
        "ORDER BY ?a",
    )
    assert [(r.a, r.n) for r in out.collect()] == [
        ("alice", None), ("bob", None)
    ]


def test_not_exists_full_group(spark):
    # anti-join a two-pattern group: drop people who know a Robot
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> "Person" . '
        'FILTER NOT EXISTS { ?a <knows> ?x . ?x <type> "Robot" . } }',
    )
    assert [r.a for r in out.collect()] == []


def test_exists_full_group(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> ?t . '
        'FILTER EXISTS { ?a <knows> ?x . ?x <type> "Robot" . } } '
        "ORDER BY ?a",
    )
    assert [r.a for r in out.collect()] == ["alice", "bob"]


def test_having_filters_groups(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a <knows> ?b . } "
        "GROUP BY ?a HAVING (?n >= 2)",
    )
    assert [(r.a, r.n) for r in out.collect()] == [("alice", 2)]


def test_having_references_group_key_and_alias(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a <knows> ?b . } "
        'GROUP BY ?a HAVING (?n = 1 && STRSTARTS(?a, "b")) ORDER BY ?a',
    )
    assert [(r.a, r.n) for r in out.collect()] == [("bob", 1)]


def test_having_multiple_blocks_are_anded(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a <knows> ?b . } "
        "GROUP BY ?a HAVING (?n >= 1) (?n < 2)",
    )
    assert [(r.a, r.n) for r in out.collect()] == [("bob", 1)]


def test_group_concat_sorted_with_separator(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a (GROUP_CONCAT(?b ; SEPARATOR="|") AS ?all) '
        "WHERE { ?a <knows> ?b . } GROUP BY ?a ORDER BY ?a",
    )
    assert [(r.a, r.all) for r in out.collect()] == [
        ("alice", "bob|carol"),
        ("bob", "carol"),
    ]


def test_group_concat_default_separator_is_space(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT (GROUP_CONCAT(?b) AS ?all) WHERE { <alice> <knows> ?b . }",
    )
    assert out.collect()[0].all == "bob carol"


def test_sample_is_deterministic_min(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (SAMPLE(?b) AS ?one) WHERE { ?a <knows> ?b . } "
        "GROUP BY ?a ORDER BY ?a",
    )
    assert [(r.a, r.one) for r in out.collect()] == [
        ("alice", "bob"),
        ("bob", "carol"),
    ]


def test_subquery_aggregate_then_join(spark):
    # classic agg-then-join: people alice knows, with their out-degree
    out = sparql_select(
        _triples(spark),
        "SELECT ?b ?n WHERE { <alice> <knows> ?b . "
        "{ SELECT ?b (COUNT(?c) AS ?n) WHERE { ?b <knows> ?c . } "
        "GROUP BY ?b } } ORDER BY ?b",
    )
    assert [(r.b, r.n) for r in out.collect()] == [("bob", 1)]


def test_subquery_projection_restricts_join_vars(spark):
    # inner ?x is projected away -> join happens on ?b only
    out = sparql_select(
        _triples(spark),
        'SELECT ?b WHERE { ?b <type> "Person" . '
        "{ SELECT ?b WHERE { ?x <knows> ?b . } } } ORDER BY ?b",
    )
    assert [r.b for r in out.collect()] == ["bob"]


def test_subquery_with_having_and_limit(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a WHERE { ?a <type> ?t . "
        "{ SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a <knows> ?b . } "
        "GROUP BY ?a HAVING (?n >= 2) LIMIT 5 } }",
    )
    assert [r.a for r in out.collect()] == ["alice"]


def test_subquery_disjoint_raises(spark):
    with pytest.raises(SparqlError, match="cartesian"):
        sparql_select(
            _triples(spark),
            "SELECT ?a ?z WHERE { ?a <type> ?t . "
            "{ SELECT ?z WHERE { ?z <banned> ?w . } } }",
        ).collect()


def test_subquery_only_group(spark):
    # a group may consist of just the subquery
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?n WHERE { "
        "{ SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a <knows> ?b . } "
        "GROUP BY ?a } } ORDER BY DESC(?n)",
    )
    assert [(r.a, r.n) for r in out.collect()] == [("alice", 2), ("bob", 1)]


@pytest.mark.parametrize(
    "bad",
    [
        # HAVING without aggregates
        "SELECT ?a WHERE { ?a <p> ?b . } HAVING (?a > 1)",
        # separator argument outside GROUP_CONCAT
        'SELECT (COUNT(?b ; SEPARATOR=",") AS ?n) WHERE { ?a <p> ?b . }',
        # nested brace that is not a subquery
        "SELECT ?a WHERE { ?a <p> ?b . { ?b <q> ?c . } }",
        # unquoted separator
        "SELECT (GROUP_CONCAT(?b ; SEPARATOR=x) AS ?s) WHERE { ?a <p> ?b . }",
    ],
)
def test_having_subquery_rejects(bad):
    with pytest.raises(SparqlError):
        parse_select(bad)


def test_construct_where_shorthand(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(
        _triples(spark),
        'CONSTRUCT WHERE { ?a <knows> ?b . ?b <type> "Person" . }',
    )
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    # alice-knows-bob (bob is a Person) instantiates both patterns
    assert rows == {
        ("alice", "knows", "bob"),
        ("bob", "type", "Person"),
    }


def test_construct_where_rejects_filters_and_paths(spark):
    from search_spark.operators.sparql import sparql_query

    with pytest.raises(SparqlError):
        sparql_query(
            _triples(spark),
            "CONSTRUCT WHERE { ?a <knows> ?b . FILTER(?a < ?b) }",
        )
    with pytest.raises(SparqlError):
        sparql_query(
            _triples(spark), "CONSTRUCT WHERE { ?a <knows>+ ?b . }"
        )


def test_describe_variable_where(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(
        _triples(spark),
        'DESCRIBE ?p WHERE { ?p <type> "Robot" . }',
    )
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    # every triple mentioning carol, in any position, exactly once
    assert rows == {
        ("alice", "knows", "carol"),
        ("bob", "knows", "carol"),
        ("carol", "type", "Robot"),
        ("carol", "banned", "spam"),
    }
    assert out.count() == 4  # set semantics: no duplicate rows


def test_describe_variable_unbound_raises(spark):
    from search_spark.operators.sparql import sparql_query

    with pytest.raises(SparqlError):
        sparql_query(
            _triples(spark), 'DESCRIBE ?zz WHERE { ?p <type> "Robot" . }'
        )


# ---- SELECT projection expressions: ( expr AS ?alias ) ----


def test_select_expr_string_fn(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (UCASE(?b) AS ?ub) WHERE { ?a <knows> ?b . } "
        "ORDER BY ?a ?ub",
    )
    assert [(r.a, r.ub) for r in out.collect()] == [
        ("alice", "BOB"), ("alice", "CAROL"), ("bob", "CAROL"),
    ]


def test_select_expr_arithmetic_and_concat(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT (STRLEN(?b) + 1 AS ?n) (CONCAT(?a, "-", ?b) AS ?pair) '
        "WHERE { ?a <knows> ?b . } ORDER BY ?pair",
    )
    rows = [(r.n, r.pair) for r in out.collect()]
    assert rows == [
        (4.0, "alice-bob"), (6.0, "alice-carol"), (6.0, "bob-carol"),
    ]


def test_select_expr_over_aggregate_alias(spark):
    # expressions evaluate after grouping, so they may reference
    # aggregate aliases
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (COUNT(?b) AS ?n) (?n * 10 AS ?n10) "
        "WHERE { ?a <knows> ?b . } GROUP BY ?a ORDER BY ?a",
    )
    assert [(r.a, r.n, r.n10) for r in out.collect()] == [
        ("alice", 2, 20.0), ("bob", 1, 10.0),
    ]


def test_select_expr_chained_aliases(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT (STRLEN(?a) AS ?n) (?n + ?n AS ?nn) "
        'WHERE { ?a <type> "Robot" . }',
    )
    assert [(r.n, r.nn) for r in out.collect()] == [(5, 10.0)]


def test_select_expr_unbound_reference_rejected(spark):
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            _triples(spark),
            "SELECT (?zzz + 1 AS ?x) WHERE { ?a <knows> ?b . }",
        )


def test_select_star_with_expr_rejected(spark):
    with pytest.raises(SparqlError):
        sparql_select(
            _triples(spark),
            "SELECT * (STRLEN(?a) AS ?n) WHERE { ?a <knows> ?b . }",
        )


def test_bind_numeric_builtins(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?f ?c ?r ?ab WHERE { ?a <knows> ?b . "
        "BIND(STRLEN(?a) / 2 AS ?h) "
        "BIND(FLOOR(?h) AS ?f) BIND(CEIL(?h) AS ?c) "
        "BIND(ROUND(?h) AS ?r) BIND(ABS(0 - ?h) AS ?ab) } "
        "ORDER BY ?a ?f",
    ).distinct()
    rows = sorted((r.a, r.f, r.c, r.r, r.ab) for r in out.collect())
    # alice: strlen 5 -> h=2.5; bob: strlen 3 -> h=1.5
    assert rows == [
        ("alice", 2.0, 3.0, 3.0, 2.5),
        ("bob", 1.0, 2.0, 2.0, 1.5),
    ]


def test_bind_strbefore_strafter(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?b ?pre ?post ?miss WHERE { ?a <knows> ?b . '
        'BIND(STRBEFORE(?b, "o") AS ?pre) '
        'BIND(STRAFTER(?b, "o") AS ?post) '
        'BIND(STRAFTER(?b, "zz") AS ?miss) } ORDER BY ?b',
    ).distinct()
    rows = sorted((r.b, r.pre, r.post, r.miss) for r in out.collect())
    assert rows == [("bob", "b", "b", ""), ("carol", "car", "l", "")]


def test_bind_hash_builtins(spark):
    import hashlib

    out = sparql_select(
        _triples(spark),
        'SELECT ?m ?s1 ?s2 WHERE { ?a <type> "Robot" . '
        "BIND(MD5(?a) AS ?m) BIND(SHA1(?a) AS ?s1) "
        "BIND(SHA256(?a) AS ?s2) }",
    )
    r = out.collect()[0]
    assert r.m == hashlib.md5(b"carol").hexdigest()
    assert r.s1 == hashlib.sha1(b"carol").hexdigest()
    assert r.s2 == hashlib.sha256(b"carol").hexdigest()


def test_filter_numeric_builtin_comparison(spark):
    # FLOOR in a FILTER comparison side takes the numeric compare path
    out = sparql_select(
        _triples(spark),
        "SELECT ?a WHERE { ?a <knows> ?b . "
        "FILTER(FLOOR(STRLEN(?a) / 2) >= 2) }",
    ).distinct()
    assert [r.a for r in out.collect()] == ["alice"]


def test_order_by_expression(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?b WHERE { ?a <knows> ?b . } "
        "ORDER BY DESC(STRLEN(?b)) ?a ?b",
    )
    assert [(r.a, r.b) for r in out.collect()] == [
        ("alice", "carol"), ("bob", "carol"), ("alice", "bob"),
    ]


def test_order_by_bare_parenthesized_expr(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?b WHERE { ?a <knows> ?b . } "
        "ORDER BY (CONCAT(?b, ?a))",
    )
    assert [(r.a, r.b) for r in out.collect()] == [
        ("alice", "bob"), ("alice", "carol"), ("bob", "carol"),
    ]


def test_order_by_expr_unbound_rejected(spark):
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            _triples(spark),
            "SELECT ?a WHERE { ?a <knows> ?b . } "
            "ORDER BY DESC(STRLEN(?zz))",
        )


def test_sparql_results_json_serialization(spark):
    from search_spark.operators.sparql import to_sparql_results_json

    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?n WHERE { ?a <type> ?t . "
        "OPTIONAL { ?a <name> ?n . } } ORDER BY ?a",
    )
    doc = to_sparql_results_json(out.collect(), out.columns)
    assert doc["head"] == {"vars": ["a", "n"]}
    b = doc["results"]["bindings"]
    assert {"a": {"type": "literal", "value": "bob"},
            "n": {"type": "literal", "value": "Bobby"}} in b
    # unbound OPTIONAL omits the binding, per the spec
    alice = [x for x in b if x["a"]["value"] == "alice"][0]
    assert "n" not in alice


def test_sparql_results_tsv_serialization(spark):
    from search_spark.operators.sparql import to_sparql_results_tsv

    out = sparql_select(
        _triples(spark),
        "SELECT ?a ?n WHERE { ?a <type> ?t . "
        "OPTIONAL { ?a <name> ?n . } } ORDER BY ?a",
    )
    tsv = to_sparql_results_tsv(out.collect(), out.columns)
    lines = tsv.splitlines()
    assert lines[0] == "?a\t?n"
    assert "bob\tBobby" in lines
    assert "alice\t" in lines  # unbound -> empty field


def test_filter_regex_flags(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> ?t . FILTER(REGEX(?t, "^ROB", "i")) }',
    )
    assert [r.a for r in out.collect()] == ["carol"]
    # without the i flag the uppercase pattern misses the mixed-case term
    out2 = sparql_select(
        _triples(spark),
        'SELECT ?a WHERE { ?a <type> ?t . FILTER(REGEX(?t, "^ROB")) }',
    )
    assert out2.collect() == []


def test_filter_regex_bad_flags_rejected(spark):
    with pytest.raises(SparqlError, match="flags"):
        sparql_select(
            _triples(spark),
            'SELECT ?a WHERE { ?a <type> ?t . FILTER(REGEX(?t, "x", "g")) }',
        )


# ---- PREFIX declarations ----


def _iri_triples(spark):
    rows = [
        ("http://ex.org/alice", "http://ex.org/knows", "http://ex.org/bob"),
        ("http://ex.org/bob", "http://ex.org/knows", "http://ex.org/carol"),
        ("http://ex.org/alice", "http://other.org/age", "34"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def test_prefix_expansion_select(spark):
    out = sparql_select(
        _iri_triples(spark),
        "PREFIX ex: <http://ex.org/> "
        "SELECT ?o WHERE { ex:alice ex:knows ?o . }",
    )
    assert [r.o for r in out.collect()] == ["http://ex.org/bob"]


def test_prefix_empty_and_multiple(spark):
    out = sparql_select(
        _iri_triples(spark),
        "PREFIX : <http://ex.org/> PREFIX oth: <http://other.org/> "
        "SELECT ?n WHERE { :alice oth:age ?n . }",
    )
    assert [r.n for r in out.collect()] == ["34"]


def test_prefix_in_property_path_and_filter(spark):
    out = sparql_select(
        _iri_triples(spark),
        "PREFIX ex: <http://ex.org/> "
        "SELECT ?o WHERE { ex:alice ex:knows/ex:knows ?o . "
        'FILTER(STRSTARTS(?o, "http")) }',
    )
    assert [r.o for r in out.collect()] == ["http://ex.org/carol"]


def test_undeclared_prefix_token_passes_through(spark):
    # colon-bearing bare terms with no declared prefix stay literal
    rows = [("urn:x:1", "p", "v")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf, "PREFIX ex: <http://ex.org/> SELECT ?o WHERE { urn:x:1 p ?o . }"
    )
    assert [r.o for r in out.collect()] == ["v"]


def test_malformed_prefix_rejected(spark):
    with pytest.raises(SparqlError, match="PREFIX"):
        sparql_select(
            _iri_triples(spark),
            'PREFIX ex <http://ex.org/> SELECT ?o WHERE { ?s ?p ?o . }',
        )


def test_prefix_path_modifier_adjoined(spark):
    # `ex:knows+` merges into one bare token at the lexer; expansion
    # splits it back into path tokens
    out = sparql_select(
        _iri_triples(spark),
        "PREFIX ex: <http://ex.org/> "
        "SELECT ?o WHERE { ex:alice ex:knows+ ?o . } ORDER BY ?o",
    )
    assert [r.o for r in out.collect()] == [
        "http://ex.org/bob", "http://ex.org/carol",
    ]


def test_prefix_update_forms(spark, tmp_path):
    from search_spark.io.snapshots import SnapshotTable
    from search_spark.operators.sparql import sparql_update

    t = SnapshotTable(spark, str(tmp_path / "kg"))
    t.append(spark.createDataFrame(
        [("http://ex.org/alice", "http://ex.org/knows",
          "http://ex.org/bob", "g", "http://a")],
        "subj string, pred string, obj string, prov string, url string",
    ))
    res = sparql_update(
        t,
        "PREFIX ex: <http://ex.org/> "
        "DELETE { ?s ex:knows ?o . } INSERT { ?o ex:knownBy ?s . } "
        "WHERE { ?s ex:knows ?o . }",
    )
    assert res["n_deleted"] == 1 and res["n_rows"] == 1
    rows = {(r.subj, r.pred, r.obj) for r in t.load().collect()}
    assert rows == {("http://ex.org/bob", "http://ex.org/knownBy",
                     "http://ex.org/alice")}


def test_a_keyword_is_rdf_type(spark):
    from search_spark.operators.sparql import RDF_TYPE

    rows = [
        ("alice", RDF_TYPE, "Person"),
        ("r2d2", RDF_TYPE, "Robot"),
        ("alice", "a", "ignored"),  # 'a' as a DATA predicate is untouched
    ]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf, 'SELECT ?s WHERE { ?s a "Person" . }'
    )
    assert [r.s for r in out.collect()] == ["alice"]
    # 'a' in subject/object positions stays a plain constant
    out2 = sparql_select(tdf, "SELECT ?o WHERE { alice a ?o . }")
    assert [r.o for r in out2.collect()] == ["Person"]
    # and inside a property path
    out3 = sparql_select(tdf, 'SELECT ?s WHERE { ?s a|<never> "Robot" . }')
    assert [r.s for r in out3.collect()] == ["r2d2"]


def test_trailing_values_clause(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?a ?b WHERE { ?a <knows> ?b . } VALUES ?b { "carol" }',
    )
    assert sorted((r.a, r.b) for r in out.collect()) == [
        ("alice", "carol"), ("bob", "carol"),
    ]


def test_trailing_values_spans_union(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a WHERE { { ?a <knows> ?x . } UNION { ?x <knows> ?a . } } "
        'VALUES ?a { "carol" "alice" }',
    )
    assert sorted({r.a for r in out.collect()}) == ["alice", "carol"]


def test_trailing_values_before_aggregation(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a <knows> ?b . } "
        'GROUP BY ?a VALUES ?b { "bob" "carol" } ORDER BY ?a',
    )
    # VALUES restricts bindings BEFORE the aggregate
    assert [(r.a, r.n) for r in out.collect()] == [("alice", 2), ("bob", 1)]


def test_filter_isnumeric(spark):
    rows = [("a", "v", "34"), ("b", "v", "3.5e2"), ("c", "v", "x12"),
            ("d", "v", "")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf, "SELECT ?s WHERE { ?s <v> ?o . FILTER(ISNUMERIC(?o)) }"
    )
    assert sorted(r.s for r in out.collect()) == ["a", "b"]
    out2 = sparql_select(
        tdf, "SELECT ?s WHERE { ?s <v> ?o . FILTER(!ISNUMERIC(?o)) }"
    )
    assert sorted(r.s for r in out2.collect()) == ["c", "d"]


def test_aggregate_expression_arguments(spark):
    out = sparql_select(
        _triples(spark),
        "SELECT ?a (SUM(STRLEN(?b) * 2) AS ?s) "
        "(COUNT(DISTINCT UCASE(?b)) AS ?cu) (AVG(STRLEN(?b)) AS ?m) "
        "WHERE { ?a <knows> ?b . } GROUP BY ?a ORDER BY ?a",
    )
    rows = [(r.a, r.s, r.cu, r.m) for r in out.collect()]
    # alice knows bob(3), carol(5); bob knows carol(5)
    assert rows == [("alice", 16.0, 2, 4.0), ("bob", 10.0, 1, 5.0)]


def test_aggregate_expression_unbound_rejected(spark):
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            _triples(spark),
            "SELECT (SUM(?zz + 1) AS ?s) WHERE { ?a <knows> ?b . }",
        )


def _quads(spark):
    """Named-graph quad fixture: prov is the graph label (NULL = default
    graph), matching the engine's quad model (io/ntriples)."""
    rows = [
        ("alice", "knows", "bob", "g1"),
        ("bob", "type", "Person", "g1"),
        ("alice", "knows", "carol", "g2"),
        ("carol", "type", "Person", "g1"),   # cross-graph vs g2's knows
        ("bob", "type", "Robot", "g2"),
        ("dan", "knows", "erin", None),      # default graph
        ("erin", "type", "Person", None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, prov string"
    )


def test_graph_var_same_graph_join(spark):
    # both patterns must match within ONE named graph per ?g binding;
    # alice→carol (g2) + carol:Person (g1) is cross-graph and must not
    # bind, and the default-graph dan/erin rows never appear
    out = sparql_select(
        _quads(spark),
        "SELECT ?g ?x ?t WHERE { GRAPH ?g { ?x <knows> ?y . "
        "?y <type> ?t } }",
    )
    assert sorted(map(tuple, out.collect())) == [("g1", "alice", "Person")]


def test_graph_var_single_pattern_binds_label(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT DISTINCT ?g ?y WHERE { GRAPH ?g { ?x <type> ?y } } "
        "ORDER BY ?g ?y",
    )
    assert [tuple(r) for r in out.collect()] == [
        ("g1", "Person"), ("g2", "Robot")
    ]


def test_graph_var_aggregate(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT ?g (COUNT(?x) AS ?n) WHERE { GRAPH ?g { ?x <type> ?t } } "
        "GROUP BY ?g ORDER BY ?g",
    )
    assert [tuple(r) for r in out.collect()] == [("g1", 2), ("g2", 1)]


def test_graph_var_union_with_constant_graph(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT ?g ?x WHERE { { GRAPH ?g { ?x <knows> ?y } } UNION "
        '{ GRAPH <g1> { ?x <type> ?t . BIND("const" AS ?g) } } } '
        "ORDER BY ?g ?x",
    )
    assert [tuple(r) for r in out.collect()] == [
        ("const", "bob"), ("const", "carol"),
        ("g1", "alice"), ("g2", "alice"),
    ]


def test_graph_var_not_exists_scoped_to_graph(spark):
    # NOT EXISTS inside GRAPH ?g checks within the same graph only:
    # bob has type in g1 AND g2, carol only in g1 → in g2 carol's
    # absence keeps alice→carol
    out = sparql_select(
        _quads(spark),
        "SELECT ?g ?y WHERE { GRAPH ?g { ?x <knows> ?y . "
        "FILTER NOT EXISTS { ?y <type> ?t } } }",
    )
    assert sorted(map(tuple, out.collect())) == [("g2", "carol")]


def test_graph_var_needs_prov_column(spark):
    from search_spark.operators.sparql import SparqlError

    tdf = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    with pytest.raises(SparqlError, match="prov"):
        sparql_select(tdf, "SELECT ?g WHERE { GRAPH ?g { ?x <p> ?y } }")


def test_graph_var_rejects_subqueries(spark):
    from search_spark.operators.sparql import SparqlError

    with pytest.raises(SparqlError, match="GRAPH .var"):
        sparql_select(
            _quads(spark),
            "SELECT ?g WHERE { GRAPH ?g { { SELECT ?x WHERE "
            "{ ?x <knows> ?y } } } }",
        )


def test_values_undef_tuple(spark):
    # ("alice" UNDEF) leaves ?y unconstrained; (UNDEF "erin") leaves ?x
    out = sparql_select(
        _quads(spark),
        'SELECT ?x ?y WHERE { ?x <knows> ?y . VALUES (?x ?y) { '
        '("alice" UNDEF) (UNDEF "erin") } } ORDER BY ?x ?y',
    )
    assert [tuple(r) for r in out.collect()] == [
        ("alice", "bob"), ("alice", "carol"), ("dan", "erin")
    ]


def test_values_all_undef_row_keeps_everything(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT ?x WHERE { ?x <knows> ?y . VALUES (?x ?y) "
        "{ (UNDEF UNDEF) } }",
    )
    assert sorted(r.x for r in out.collect()) == ["alice", "alice", "dan"]


def test_values_undef_mixed_with_bound_rows(spark):
    # defined row joins exactly; UNDEF row contributes its own matches —
    # one output row per compatible (binding, VALUES-row) pair
    out = sparql_select(
        _quads(spark),
        'SELECT ?x ?y WHERE { ?x <knows> ?y . VALUES (?x ?y) { '
        '("alice" "bob") ("dan" UNDEF) } } ORDER BY ?x',
    )
    assert [tuple(r) for r in out.collect()] == [
        ("alice", "bob"), ("dan", "erin")
    ]


def test_from_builds_default_graph(spark):
    # FROM <g1>: active default graph = g1's quads; plain patterns see
    # only those (the no-clause union-of-all convenience is replaced)
    out = sparql_select(
        _quads(spark),
        "SELECT ?x ?y FROM <g1> WHERE { ?x <knows> ?y }",
    )
    assert [tuple(r) for r in out.collect()] == [("alice", "bob")]


def test_from_merges_multiple_graphs(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT ?x ?t FROM <g1> FROM <g2> WHERE { ?x <knows> ?y . "
        "?y <type> ?t } ORDER BY ?x ?t",
    )
    # the merged default graph joins across g1 and g2 quads
    assert [tuple(r) for r in out.collect()] == [
        ("alice", "Person"), ("alice", "Person"), ("alice", "Robot"),
    ]


def test_from_excludes_graph_blocks(spark):
    # with only FROM, the active named-graph set is empty: GRAPH
    # matches nothing even for a graph that exists in the store
    out = sparql_select(
        _quads(spark),
        "SELECT ?x FROM <g1> WHERE { GRAPH <g1> { ?x <knows> ?y } }",
    )
    assert out.count() == 0


def test_from_named_only_empties_default_graph(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT ?x FROM NAMED <g1> WHERE { ?x <knows> ?y }",
    )
    assert out.count() == 0


def test_from_named_restricts_graph_var(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT ?g ?x FROM NAMED <g2> WHERE { GRAPH ?g { ?x <knows> ?y } }",
    )
    assert [tuple(r) for r in out.collect()] == [("g2", "alice")]


def test_from_and_from_named_combine(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT ?x ?t FROM <g2> FROM NAMED <g1> WHERE { "
        "?x <knows> ?y . GRAPH <g1> { ?y <type> ?t } } ",
    )
    # plain pattern reads g2 (alice knows carol); GRAPH reads g1
    assert [tuple(r) for r in out.collect()] == [("alice", "Person")]


def test_ask_and_construct_take_dataset_clauses(spark):
    from search_spark.operators.sparql import sparql_query

    assert sparql_query(_quads(spark), "ASK FROM <g2> { ?x <knows> ?y }")
    assert not sparql_query(
        _quads(spark), "ASK FROM NAMED <g2> { ?x <knows> ?y }"
    )
    out = sparql_query(
        _quads(spark),
        "CONSTRUCT { ?y <knownBy> ?x } FROM <g1> WHERE { ?x <knows> ?y }",
    )
    assert [tuple(r) for r in out.collect()] == [("bob", "knownBy", "alice")]


def test_describe_takes_dataset_clauses(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(
        _quads(spark),
        "DESCRIBE ?y FROM <g1> WHERE { ?x <knows> ?y }",
    )
    # WHERE binds ?y=bob from g1; the description itself reads the
    # full store (implementation-defined per §16.4) and includes
    # triples with the resource in subject OR object position
    assert sorted(map(tuple, out.select("subj", "pred", "obj").collect())) == [
        ("alice", "knows", "bob"),
        ("bob", "type", "Person"), ("bob", "type", "Robot"),
    ]


def test_subquery_rejects_dataset_clause(spark):
    from search_spark.operators.sparql import SparqlError

    with pytest.raises(SparqlError, match="dataset"):
        sparql_select(
            _quads(spark),
            "SELECT ?x WHERE { { SELECT ?x FROM <g1> WHERE "
            "{ ?x <knows> ?y } } }",
        )


def test_from_requires_constant_iri(spark):
    from search_spark.operators.sparql import SparqlError

    with pytest.raises(SparqlError, match="constant graph"):
        sparql_select(
            _quads(spark), "SELECT ?x FROM ?g WHERE { ?x <knows> ?y }"
        )


def test_predicate_object_list(spark):
    # Turtle-style ';' shares the subject across predicate-object pairs
    out = sparql_select(
        _quads(spark),
        'SELECT ?x ?y WHERE { ?x <type> "Person" ; ^<knows> ?y }',
    )
    assert sorted(map(tuple, out.collect())) == [
        ("bob", "alice"), ("carol", "alice"), ("erin", "dan"),
    ]


def test_object_list(spark):
    # ',' shares subject AND predicate: conjunctive, both must hold
    out = sparql_select(
        _triples(spark),
        'SELECT ?x WHERE { ?x <knows> "bob", "carol" }',
    )
    assert [r.x for r in out.collect()] == ["alice"]


def test_pattern_list_trailing_semicolon(spark):
    out = sparql_select(
        _quads(spark),
        'SELECT ?x WHERE { ?x <type> "Person" ; . }',
    )
    assert sorted(r.x for r in out.collect()) == ["bob", "carol", "erin"]


def test_construct_template_lists(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(
        _triples(spark),
        'CONSTRUCT { ?x <tag> "seen" ; <src> "kg", "web" } '
        "WHERE { ?x <knows> ?y . FILTER(?y = \"carol\") }",
    )
    assert sorted(map(tuple, out.select("subj", "pred", "obj").collect())) == [
        ("alice", "src", "kg"), ("alice", "src", "web"),
        ("alice", "tag", "seen"),
        ("bob", "src", "kg"), ("bob", "src", "web"),
        ("bob", "tag", "seen"),
    ]


def test_insert_data_lists(spark, tmp_path):
    from search_spark.io.snapshots import SnapshotTable
    from search_spark.operators.sparql import sparql_update

    t = SnapshotTable(spark, str(tmp_path / "kg"))
    res = sparql_update(
        t,
        'INSERT DATA { <a> <p> "1", "2" ; <q> "3" . <b> <p> "4" }',
    )
    assert res["n_rows"] == 4
    rows = {(r.subj, r.pred, r.obj) for r in t.load().collect()}
    assert rows == {("a", "p", "1"), ("a", "p", "2"),
                    ("a", "q", "3"), ("b", "p", "4")}


def test_iri_a_is_not_the_type_keyword(spark):
    # bare `a` is rdf:type; the bracketed IRI <a> is a plain term
    from search_spark.operators.sparql import RDF_TYPE

    rows = [("s1", "a", "x"), ("s1", RDF_TYPE, "Person")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(tdf, "SELECT ?o WHERE { s1 <a> ?o }")
    assert [r.o for r in out.collect()] == ["x"]
    out2 = sparql_select(tdf, "SELECT ?o WHERE { s1 a ?o }")
    assert [r.o for r in out2.collect()] == ["Person"]


def test_blank_node_label_joins(spark):
    # _:b is an unnamed variable: both occurrences bind the same value
    out = sparql_select(
        _triples(spark),
        "SELECT ?x WHERE { ?x <knows> _:b . _:b <knows> ?y }",
    )
    assert sorted({r.x for r in out.collect()}) == ["alice"]


def test_anonymous_blank_nodes_are_independent(spark):
    # each [] is a fresh variable — two [] terms do not join
    out = sparql_select(
        _triples(spark), "SELECT DISTINCT ?x WHERE { ?x <knows> [] }"
    )
    assert sorted(r.x for r in out.collect()) == ["alice", "bob"]
    out2 = sparql_select(
        _triples(spark), "SELECT DISTINCT ?x WHERE { ?x <knows> [ ] }"
    )
    assert sorted(r.x for r in out2.collect()) == ["alice", "bob"]


def test_select_star_hides_blank_node_vars(spark):
    out = sparql_select(
        _triples(spark), "SELECT * WHERE { ?x <knows> _:b }"
    )
    assert out.columns == ["x"]
    # projecting the bnode away keeps multiset semantics: alice twice
    assert sorted(r.x for r in out.collect()) == ["alice", "alice", "bob"]
    dis = sparql_select(
        _triples(spark), "SELECT DISTINCT * WHERE { ?x <knows> _:b }"
    )
    assert sorted(r.x for r in dis.collect()) == ["alice", "bob"]


def test_construct_template_bnode_fresh_per_solution(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(
        _triples(spark),
        "CONSTRUCT { ?x <attends> _:e . _:e a <Event> } "
        "WHERE { ?x <knows> \"carol\" }",
    )
    rows = sorted(map(tuple, out.select("subj", "pred", "obj").collect()))
    events = {o for s, p, o in rows if p == "attends"}
    event_subjects = {s for s, p, o in rows if o == "Event"}
    # one fresh node per solution, reused across the template's triples
    assert len(events) == 2 and events == event_subjects
    assert all(e.startswith("_:e") for e in events)


def test_delete_template_rejects_blank_nodes(spark, tmp_path):
    from search_spark.io.snapshots import SnapshotTable
    from search_spark.operators.sparql import sparql_update

    t = SnapshotTable(spark, str(tmp_path / "kg"))
    t.append(spark.createDataFrame(
        [("a", "p", "b", None, "u")],
        "subj string, pred string, obj string, prov string, url string",
    ))
    with pytest.raises(SparqlError, match="blank nodes"):
        sparql_update(t, "DELETE { ?s <p> _:x } WHERE { ?s <p> ?o }")


def test_reserved_variable_prefix_rejected(spark):
    with pytest.raises(SparqlError, match="reserved"):
        sparql_select(
            _triples(spark),
            "SELECT ?x WHERE { ?x <knows> ?__bnode__y }",
        )


def test_blank_node_property_list_as_object(spark):
    out = sparql_select(
        _quads(spark),
        'SELECT ?x WHERE { ?x <knows> [ <type> "Person" ] }',
    )
    assert sorted({r.x for r in out.collect()}) == ["alice", "dan"]


def test_blank_node_property_list_as_subject(spark):
    out = sparql_select(
        _quads(spark),
        'SELECT ?o WHERE { [ <knows> "bob" ] <type> ?o }',
    )
    assert sorted(r.o for r in out.collect()) == []
    out2 = sparql_select(
        _quads(spark),
        'SELECT ?o WHERE { [ <knows> "erin" ] <knows> ?o }',
    )
    assert [r.o for r in out2.collect()] == ["erin"]


def test_bare_subject_property_list_triple(spark):
    out = sparql_select(
        _quads(spark),
        "SELECT DISTINCT ?t WHERE { [ <type> ?t ] . }",
    )
    assert sorted(r.t for r in out.collect()) == ["Person", "Robot"]


def test_nested_property_lists_and_semicolons(spark):
    out = sparql_select(
        _triples(spark),
        'SELECT ?x WHERE { ?x <knows> [ <knows> "carol" ] }',
    )
    # ?x knows someone who knows carol: alice→bob→carol
    assert sorted({r.x for r in out.collect()}) == ["alice"]
    out2 = sparql_select(
        _quads(spark),
        'SELECT ?x WHERE { ?x <knows> [ <type> "Person" ; <knows> [] ] }',
    )
    # nobody in the quad fixture is both known and a knower
    assert out2.count() == 0


def test_bgp_connects_in_any_written_order(spark):
    # connected overall but not in written order — must not raise
    out = sparql_select(
        _quads(spark),
        'SELECT ?a WHERE { ?b <type> "Person" . ?a <knows> ?b }',
    )
    assert sorted({r.a for r in out.collect()}) == ["alice", "dan"]


def test_disconnected_bgp_still_raises(spark):
    from search_spark.operators.sparql import SparqlError

    with pytest.raises(Exception):
        sparql_select(
            _quads(spark),
            "SELECT ?a ?c WHERE { ?a <knows> ?b . ?c <type> ?d }",
        ).collect()


def test_encode_for_uri(spark):
    rows = [("a", "v", "ab c/d~e*f")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf,
        "SELECT ?e WHERE { ?s <v> ?o . BIND(ENCODE_FOR_URI(?o) AS ?e) }",
    )
    # RFC 3986: space -> %20 (not +), '~' unreserved, '*' encoded
    assert [r.e for r in out.collect()] == ["ab%20c%2Fd~e%2Af"]


def test_sameterm_filter(spark):
    rows = [("a", "p", "x"), ("b", "p", "y"), ("x", "q", "x")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf,
        "SELECT ?s WHERE { ?s <p> ?o . ?o <q> ?w . "
        "FILTER(sameTerm(?o, ?w)) }",
    )
    assert [r.s for r in out.collect()] == ["a"]
    out2 = sparql_select(
        tdf,
        "SELECT ?s WHERE { ?s <p> ?o . FILTER(!sameTerm(?o, \"x\")) }",
    )
    assert [r.s for r in out2.collect()] == ["b"]


def test_turtle_abbreviation_random_differential(spark):
    """Randomized invariant: a Turtle-abbreviated group (predicate-object
    lists, object lists, blank-node property lists) binds exactly like
    its hand-expanded plain-triple form with explicit variables."""
    import random

    rng = random.Random(20260820)
    subjects = [f"s{i}" for i in range(5)]
    preds = [f"p{i}" for i in range(3)]
    objects = subjects + [f"o{i}" for i in range(4)]

    for trial in range(15):
        rows = [
            (rng.choice(subjects), rng.choice(preds), rng.choice(objects))
            for _ in range(rng.randint(8, 25))
        ]
        tdf = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        # one subject variable, 1-3 predicate-object entries where each
        # object is a var, a constant, or a one-level property list
        fresh = iter(range(100))
        proj = ["?x"]
        abbrev_parts = []
        plain = []

        def mk_object():
            kind = rng.random()
            if kind < 0.4:
                v = f"?v{next(fresh)}"
                proj.append(v)
                return v, v
            if kind < 0.7:
                c = rng.choice(objects)
                return f'"{c}"', f'"{c}"'
            # blank-node property list with 1-2 pairs
            b = f"?b{next(fresh)}"
            inner_abbrev, inner_plain = [], []
            for _ in range(rng.randint(1, 2)):
                ip = rng.choice(preds)
                io_abbrev, io_plain = (
                    (f"?v{next(fresh)}",) * 2
                    if rng.random() < 0.5
                    else (f'"{rng.choice(objects)}"',) * 2
                )
                if io_abbrev.startswith("?"):
                    proj.append(io_abbrev)
                inner_abbrev.append(f"<{ip}> {io_abbrev}")
                inner_plain.append((b, ip, io_plain))
            return "[ " + " ; ".join(inner_abbrev) + " ]", (b, inner_plain)

        for _ in range(rng.randint(1, 3)):
            pred = rng.choice(preds)
            n_obj = rng.randint(1, 2)
            objs = [mk_object() for _ in range(n_obj)]
            abbrev_parts.append(
                f"<{pred}> " + ", ".join(a for a, _ in objs)
            )
            for _, pl in objs:
                if isinstance(pl, tuple):
                    b, inner = pl
                    plain.append(("?x", pred, b))
                    plain.extend(inner)
                else:
                    plain.append(("?x", pred, pl))

        abbrev_q = (
            "SELECT DISTINCT " + " ".join(dict.fromkeys(proj))
            + " WHERE { ?x " + " ; ".join(abbrev_parts) + " }"
        )
        def term(t):
            return t if t.startswith(("?", '"')) else f"<{t}>"
        plain_q = (
            "SELECT DISTINCT " + " ".join(dict.fromkeys(proj))
            + " WHERE { "
            + " . ".join(f"{term(s)} <{p}> {term(o)}" for s, p, o in plain)
            + " }"
        )
        got = sorted(map(tuple, sparql_select(tdf, abbrev_q).collect()))
        want = sorted(map(tuple, sparql_select(tdf, plain_q).collect()))
        assert got == want, (trial, abbrev_q, plain_q)


def _path_quads(spark):
    rows = [
        ("a", "knows", "b", "g1"), ("b", "knows", "c", "g1"),
        ("a", "knows", "c", "g2"), ("c", "knows", "d", "g2"),
        ("x", "knows", "y", None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, prov string"
    )


def test_graph_var_property_path(spark):
    # hops stay within ONE named graph per ?g binding: no a->d via
    # mixing g1 and g2 edges, and default-graph rows never appear
    out = sparql_select(
        _path_quads(spark),
        "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x <knows>+ ?y } }",
    )
    assert sorted(map(tuple, out.collect())) == [
        ("g1", "a", "b"), ("g1", "a", "c"), ("g1", "b", "c"),
        ("g2", "a", "c"), ("g2", "a", "d"), ("g2", "c", "d"),
    ]


def test_graph_var_path_constant_ends(spark):
    out = sparql_select(
        _path_quads(spark),
        "SELECT ?g ?y WHERE { GRAPH ?g { a <knows>+ ?y } }",
    )
    assert sorted(map(tuple, out.collect())) == [
        ("g1", "b"), ("g1", "c"), ("g2", "c"), ("g2", "d"),
    ]
    out2 = sparql_select(
        _path_quads(spark),
        "SELECT ?g ?x WHERE { GRAPH ?g { ?x <knows>+ d } }",
    )
    assert sorted(map(tuple, out2.collect())) == [
        ("g2", "a"), ("g2", "c"),
    ]


def test_graph_var_path_zero_length_is_per_graph(spark):
    out = sparql_select(
        _path_quads(spark),
        "SELECT ?g ?y WHERE { GRAPH ?g { a <knows>* ?y } }",
    )
    # §18.4 per graph: the seed itself in every named graph, plus the
    # per-graph reachable set
    assert sorted(map(tuple, out.collect())) == [
        ("g1", "a"), ("g1", "b"), ("g1", "c"),
        ("g2", "a"), ("g2", "c"), ("g2", "d"),
    ]


def test_graph_var_path_joins_plain_patterns_same_graph(spark):
    out = sparql_select(
        _path_quads(spark),
        "SELECT ?g ?x WHERE { GRAPH ?g { ?x <knows>+ d . "
        "?x <knows> c } }",
    )
    assert sorted(map(tuple, out.collect())) == [("g2", "a")]


def test_group_by_expression_key(spark):
    rows = [("Apple", "cat", "fruit"), ("apple", "cat", "fruit"),
            ("Beet", "cat", "veg")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf,
        "SELECT ?k (COUNT(*) AS ?n) WHERE { ?s <cat> ?c } "
        "GROUP BY (LCASE(?s) AS ?k) ORDER BY ?k",
    )
    assert [tuple(r) for r in out.collect()] == [("apple", 2), ("beet", 1)]


def test_group_by_expression_mixed_with_var(spark):
    rows = [("a", "p", "x"), ("A", "p", "x"), ("a", "p", "y")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf,
        "SELECT ?o ?k (COUNT(*) AS ?n) WHERE { ?s <p> ?o } "
        "GROUP BY ?o (UCASE(?s) AS ?k) ORDER BY ?o ?k",
    )
    assert [tuple(r) for r in out.collect()] == [
        ("x", "A", 2), ("y", "A", 1),
    ]


def test_group_by_expression_requires_alias(spark):
    with pytest.raises(SparqlError, match="AS"):
        sparql_select(
            _triples(spark),
            "SELECT (COUNT(*) AS ?n) WHERE { ?s <knows> ?o } "
            "GROUP BY (UCASE(?s))",
        )


def test_describe_multiple_resources(spark):
    from search_spark.operators.sparql import sparql_query

    out = sparql_query(_triples(spark), "DESCRIBE <alice> <carol>")
    rows = sorted(map(tuple, out.select("subj", "pred", "obj").collect()))
    # union description: triples touching either resource, deduped
    assert ("alice", "knows", "bob") in rows
    assert ("bob", "knows", "carol") in rows
    assert all(
        "alice" in (s, o) or "carol" in (s, o) for s, _, o in rows
    )


def test_sparql_results_xml_format():
    # pure serializer: W3C XML results — escaping, unbound omission,
    # ASK boolean form (no SparkSession needed)
    import xml.etree.ElementTree as ET

    from search_spark.operators.sparql import to_sparql_results_xml

    doc = to_sparql_results_xml([("a", None), ("<b>&", "c")], ["x", "y"])
    root = ET.fromstring(doc)
    ns = {"s": "http://www.w3.org/2005/sparql-results#"}
    assert [v.get("name") for v in root.findall(".//s:variable", ns)] == [
        "x", "y"
    ]
    results = root.findall(".//s:result", ns)
    assert len(results) == 2
    assert len(results[0].findall("s:binding", ns)) == 1  # NULL omitted
    lit = results[1].findall("s:binding", ns)[0].find("s:literal", ns)
    assert lit.text == "<b>&"
    ask = ET.fromstring(to_sparql_results_xml([], [], boolean=False))
    assert ask.find("s:boolean", ns).text == "false"


def test_exists_inside_filter_expression(spark):
    # [NOT] EXISTS composes with && / || / ! via left-join markers; the
    # standalone FILTER EXISTS fast path is untouched
    out = sparql_select(
        _triples(spark),
        "SELECT ?a WHERE { ?a <knows> ?b . "
        'FILTER(EXISTS { ?b <knows> ?c } || ?b = "carol") }',
    )
    assert sorted({r.a for r in out.collect()}) == ["alice", "bob"]
    out2 = sparql_select(
        _triples(spark),
        "SELECT ?a ?b WHERE { ?a <knows> ?b . "
        "FILTER(NOT EXISTS { ?b <knows> ?c } && !EXISTS "
        "{ ?b <likes> ?d }) }",
    )
    # kept only when ?b neither knows nor likes anyone
    assert all(r.b == "carol" for r in out2.collect())
    # marker columns must not leak into the result schema
    assert out2.columns == ["a", "b"]


def test_exists_atom_rejected_in_having(spark):
    with pytest.raises(SparqlError, match="EXISTS"):
        sparql_select(
            _triples(spark),
            "SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a <knows> ?b } "
            "GROUP BY ?a HAVING(EXISTS { ?a <knows> ?x })",
        )


def test_filter_and_binds_tighter_than_or(spark):
    rows = [(s, "v", str(i + 1)) for i, s in enumerate("abcd")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf,
        "SELECT ?s WHERE { ?s <v> ?o . "
        'FILTER(?o = "1" || ?o = "2" && ?o = "3") }',
    )
    # A || (B && C) — not (A || B) && C, which would be empty
    assert [r.s for r in out.collect()] == ["a"]


def test_filter_boolean_groups(spark):
    rows = [(s, "v", str(i + 1)) for i, s in enumerate("abcd")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf,
        "SELECT ?s WHERE { ?s <v> ?o . "
        'FILTER((?o = "1" || ?o = "2") && ?o != "2") }',
    )
    assert [r.s for r in out.collect()] == ["a"]
    out2 = sparql_select(
        tdf,
        'SELECT ?s WHERE { ?s <v> ?o . FILTER(!(?o = "1" || ?o = "2")) }',
    )
    assert sorted(r.s for r in out2.collect()) == ["c", "d"]
    # parenthesized ARITHMETIC comparisons still parse (backtracked)
    out3 = sparql_select(
        tdf,
        "SELECT ?s WHERE { ?s <v> ?o . FILTER((?o + 1) > 3) }",
    )
    assert sorted(r.s for r in out3.collect()) == ["c", "d"]


def test_exists_nested_in_boolean_group(spark):
    rows = [("a", "v", "1"), ("a", "tag", "x"), ("b", "v", "2")]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sparql_select(
        tdf,
        "SELECT ?s WHERE { ?s <v> ?o . "
        'FILTER((EXISTS { ?s <tag> ?t } || ?o = "2") && ?o != "9") }',
    )
    assert sorted(r.s for r in out.collect()) == ["a", "b"]
    out2 = sparql_select(
        tdf,
        "SELECT ?s WHERE { ?s <v> ?o . "
        'FILTER(!(EXISTS { ?s <tag> ?t } || ?o = "9")) }',
    )
    assert [r.s for r in out2.collect()] == ["b"]


def test_filter_boolean_random_differential(spark):
    """Randomized FILTER battery: random &&/||/!/parenthesized boolean
    expressions over comparisons, evaluated by the compiler vs a pure
    Python mirror with SPARQL 1.1 §17.2 precedence."""
    import random

    rng = random.Random(1129)
    rows = [(f"s{i}", "v", str(rng.randint(1, 5))) for i in range(30)]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    data = {s: o for s, _, o in rows}

    def gen(depth):
        kind = rng.random()
        if depth >= 2 or kind < 0.55:
            op = rng.choice(["=", "!=", "<", ">", "<=", ">="])
            lit = str(rng.randint(1, 5))
            neg = rng.random() < 0.2
            text = f"?o {op} \"{lit}\""
            fn = {
                "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b, ">": lambda a, b: a > b,
                "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
            }[op]
            pred = lambda o, fn=fn, lit=lit: fn(o, lit)
            if neg:
                # '!' applies to boolean functions only in this grammar;
                # negate via a parenthesized group
                return f"!({text})", (lambda o, p=pred: not p(o))
            return text, pred
        sub_t, sub_p = gen(depth + 1)
        sub2_t, sub2_p = gen(depth + 1)
        conj = rng.choice(["&&", "||"])
        neg = rng.random() < 0.3
        text = f"({sub_t} {conj} {sub2_t})"
        if conj == "&&":
            pred = lambda o, a=sub_p, b=sub2_p: a(o) and b(o)
        else:
            pred = lambda o, a=sub_p, b=sub2_p: a(o) or b(o)
        if neg:
            return f"!{text}", (lambda o, p=pred: not p(o))
        return text, pred

    for trial in range(12):
        # top level: flat conjunction chain exercising precedence
        n = rng.randint(1, 3)
        parts = [gen(1) for _ in range(n)]
        conjs = [rng.choice(["&&", "||"]) for _ in range(n - 1)]
        text = parts[0][0]
        for c, (t, _) in zip(conjs, parts[1:]):
            text += f" {c} {t}"

        def top(o):
            # mirror precedence: && runs fold first, then ||
            runs, cur = [], parts[0][1](o)
            for c, (_, p) in zip(conjs, parts[1:]):
                if c == "&&":
                    cur = cur and p(o)
                else:
                    runs.append(cur)
                    cur = p(o)
            runs.append(cur)
            return any(runs)

        got = sorted(
            r.s for r in sparql_select(
                tdf, f"SELECT ?s WHERE {{ ?s <v> ?o . FILTER({text}) }}"
            ).collect()
        )
        want = sorted(s for s, o in data.items() if top(o))
        assert got == want, (trial, text)


def test_optimize_flag_preserves_results(spark):
    # selectivity-ordered joins change the plan, never the answer
    rows = [("a", "common", f"x{i}") for i in range(20)] + [
        ("a", "rare", "y"), ("b", "common", "x0")
    ]
    tdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    q = "SELECT ?s ?o WHERE { ?s <common> ?o . ?s <rare> ?r }"
    base = sorted(map(tuple, sparql_select(tdf, q).collect()))
    opt = sorted(map(tuple, sparql_select(tdf, q, optimize=True).collect()))
    assert base == opt and len(base) == 20
