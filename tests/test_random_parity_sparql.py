"""Seeded randomized parity for the SPARQL compiler: random triple sets +
random queries generated as *structures* that render to (a) a SPARQL
string for the engine and (b) a pure-Python evaluation plan — so the
tokenizer, parser and DataFrame compiler are all on the tested path.
Results compare as sets of tuples (the module is set-semantics
throughout), which keeps the comparison robust to join order."""

from __future__ import annotations

import random

from search_spark.operators.sparql import sparql_select


def _mk_rng():
    return random.Random(20260819)


_NODES = [f"n{i}" for i in range(10)]
_PREDS = ["pa", "pb", "pc"]


def _random_triples(rng, n=140):
    rows = {
        (rng.choice(_NODES), rng.choice(_PREDS), rng.choice(_NODES))
        for _ in range(n)
    }
    return sorted(rows)


def _eval_patterns(triples, patterns):
    """Conjunctive pattern join with set semantics (dict bindings)."""
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
    seen, out = set(), []
    for b in binds:
        key = tuple(sorted(b.items()))
        if key not in seen:
            seen.add(key)
            out.append(b)
    return out


def _render_term(t):
    return t if t.startswith("?") else f'"{t}"'


def _render_patterns(patterns):
    return " ".join(
        f"{_render_term(s)} {_render_term(p)} {_render_term(o)} ."
        for s, p, o in patterns
    )


def _gen_chain(rng, vstart=0):
    """1-3 patterns chained on shared variables; some positions constant."""
    n = rng.randint(1, 3)
    patterns = []
    subj = f"?v{vstart}"
    for i in range(n):
        pred = rng.choice(_PREDS)
        obj = (
            rng.choice(_NODES)
            if rng.random() < 0.25
            else f"?v{vstart + i + 1}"
        )
        patterns.append((subj, pred, obj))
        if obj.startswith("?"):
            subj = obj
        # if the chain hit a constant, restart from the first variable
        else:
            subj = f"?v{vstart}"
    return patterns


def _bound_vars(patterns):
    out = []
    for pt in patterns:
        for t in pt:
            if t.startswith("?") and t[1:] not in out:
                out.append(t[1:])
    return out


def _gen_filter(rng, variables):
    """One random FILTER atom → (sparql_fragment, python_predicate)."""
    v = rng.choice(variables)
    kind = rng.choice(["cmp", "contains", "starts", "in", "notin"])
    if kind == "cmp":
        if len(variables) > 1 and rng.random() < 0.5:
            w = rng.choice([x for x in variables if x != v])
            op = rng.choice(["<", "<=", "!=", "="])
            frag = f"FILTER(?{v} {op} ?{w})"
            py = {
                "<": lambda b: b[v] < b[w],
                "<=": lambda b: b[v] <= b[w],
                "!=": lambda b: b[v] != b[w],
                "=": lambda b: b[v] == b[w],
            }[op]
            return frag, py
        c = rng.choice(_NODES)
        op = rng.choice(["<", ">=", "!="])
        frag = f'FILTER(?{v} {op} "{c}")'
        py = {
            "<": lambda b: b[v] < c,
            ">=": lambda b: b[v] >= c,
            "!=": lambda b: b[v] != c,
        }[op]
        return frag, py
    if kind == "contains":
        needle = rng.choice("n0123456789")
        neg = rng.random() < 0.5
        frag = f'FILTER({"!" if neg else ""}CONTAINS(?{v}, "{needle}"))'
        return frag, (
            (lambda b: needle not in b[v])
            if neg
            else (lambda b: needle in b[v])
        )
    if kind == "starts":
        pre = rng.choice(["n", "n1", "n2", "x"])
        frag = f'FILTER(STRSTARTS(?{v}, "{pre}"))'
        return frag, lambda b: b[v].startswith(pre)
    terms = rng.sample(_NODES, rng.randint(1, 3))
    lst = ", ".join(f'"{t}"' for t in terms)
    if kind == "in":
        return f"FILTER(?{v} IN ({lst}))", lambda b: b[v] in terms
    return f"FILTER(?{v} NOT IN ({lst}))", lambda b: b[v] not in terms


def _gen_bind(rng, variables, idx):
    """One random BIND → (fragment, python_fn, new_var_name)."""
    v = rng.choice(variables)
    name = f"b{idx}"
    kind = rng.choice(["ucase", "concat", "substr"])
    if kind == "ucase":
        return (
            f"BIND(UCASE(?{v}) AS ?{name})",
            lambda b: b[v].upper(),
            name,
        )
    if kind == "concat":
        w = rng.choice(variables)
        return (
            f'BIND(CONCAT(?{v}, "-", ?{w}) AS ?{name})',
            lambda b: b[v] + "-" + b[w],
            name,
        )
    return (
        f"BIND(SUBSTR(?{v}, 1, 2) AS ?{name})",
        lambda b: b[v][:2],
        name,
    )


def _eval_group(triples, patterns, filters, binds, minus_patterns):
    rows = _eval_patterns(triples, patterns)
    for fn, name in binds:
        for b in rows:
            b[name] = fn(b)
    for fn in filters:
        rows = [b for b in rows if fn(b)]
    if minus_patterns:
        mrows = _eval_patterns(triples, minus_patterns)
        mvars = set(_bound_vars(minus_patterns))
        gvars = {k for b in rows for k in b}
        shared = sorted(mvars & gvars)
        if shared:
            mkeys = {tuple(m[k] for k in shared) for m in mrows}
            rows = [
                b for b in rows
                if tuple(b[k] for k in shared) not in mkeys
            ]
    return rows


def test_sparql_groups_random_vs_python_reference(spark):
    rng = _mk_rng()
    triples = _random_triples(rng)
    tdf = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    ).cache()
    tdf.count()

    n_nonempty = 0
    for case in range(12):
        patterns = _gen_chain(rng)
        variables = _bound_vars(patterns)
        frags = [_render_patterns(patterns)]

        binds = []
        if rng.random() < 0.5:
            frag, fn, name = _gen_bind(rng, variables, len(binds))
            frags.append(frag)
            binds.append((fn, name))

        filters = []
        for _ in range(rng.randint(0, 2)):
            filter_vars = variables + [n for _, n in binds]
            frag, fn = _gen_filter(rng, filter_vars)
            frags.append(frag)
            filters.append(fn)

        minus_patterns = []
        if rng.random() < 0.4:
            minus_patterns = [
                (f"?{rng.choice(variables)}", rng.choice(_PREDS), "?mz")
            ]
            frags.append(
                "MINUS { " + _render_patterns(minus_patterns) + " }"
            )

        proj_pool = variables + [n for _, n in binds]
        proj = rng.sample(proj_pool, rng.randint(1, len(proj_pool)))
        query = (
            "SELECT DISTINCT "
            + " ".join(f"?{v}" for v in proj)
            + " WHERE { "
            + " ".join(frags)
            + " }"
        )

        expected = {
            tuple(b[v] for v in proj)
            for b in _eval_group(
                triples, patterns, filters, binds, minus_patterns
            )
        }
        got = {
            tuple(row[v] for v in proj)
            for row in sparql_select(tdf, query).collect()
        }
        assert got == expected, f"case {case}: {query}"
        n_nonempty += bool(expected)
    # the generator must exercise real data, not vacuous empty matches
    assert n_nonempty >= 6


def test_sparql_union_random_vs_python_reference(spark):
    rng = _mk_rng()
    triples = _random_triples(rng)
    tdf = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    ).cache()
    tdf.count()

    for case in range(6):
        # two branches over the same variable names → no NULL padding,
        # so the python reference stays a plain set union
        p1 = _gen_chain(rng)
        p2 = _gen_chain(rng)
        shared = sorted(set(_bound_vars(p1)) & set(_bound_vars(p2)))
        proj = shared[: rng.randint(1, len(shared))]
        query = (
            "SELECT DISTINCT "
            + " ".join(f"?{v}" for v in proj)
            + " WHERE { { "
            + _render_patterns(p1)
            + " } UNION { "
            + _render_patterns(p2)
            + " } }"
        )
        expected = {
            tuple(b[v] for v in proj)
            for b in _eval_patterns(triples, p1)
        } | {
            tuple(b[v] for v in proj)
            for b in _eval_patterns(triples, p2)
        }
        got = {
            tuple(row[v] for v in proj)
            for row in sparql_select(tdf, query).collect()
        }
        assert got == expected, f"case {case}: {query}"


def test_sparql_paths_random_vs_python_bfs(spark):
    rng = _mk_rng()
    # one edge relation; random digraph
    edges = sorted(
        {
            (rng.choice(_NODES), "e", rng.choice(_NODES))
            for _ in range(30)
        }
    )
    tdf = spark.createDataFrame(
        edges, "subj string, pred string, obj string"
    ).cache()
    tdf.count()
    fwd = {(s, o) for s, _, o in edges}

    def reach(starts, undirected, k):
        """Nodes reachable in 1..k hops (BFS over fwd / fwd∪flipped)."""
        step = fwd | {(b, a) for a, b in fwd} if undirected else fwd
        frontier, seen = set(starts), set()
        for _ in range(k):
            frontier = {
                b for a, b in step if a in frontier
            }
            frontier -= seen
            if not frontier:
                break
            seen |= frontier
        return seen

    for case in range(6):
        k = rng.randint(1, 3)
        undirected = rng.random() < 0.5
        start = rng.choice(_NODES)
        path = "(<e>|^<e>)" if undirected else "<e>"
        flip = rng.random() < 0.5  # constant object instead of subject
        if flip:
            q = f'SELECT ?x WHERE {{ ?x {path}{{1,{k}}} "{start}" . }}'
            # x reaches start in 1..k hops == start reaches x over the
            # flipped relation (identical set when undirected)
            base = {(b, a) for a, b in fwd}
            step = base | fwd if undirected else base
            frontier, seen = {start}, set()
            for _ in range(k):
                frontier = {b for a, b in step if a in frontier} - seen
                if not frontier:
                    break
                seen |= frontier
            expected = seen
        else:
            q = f'SELECT ?x WHERE {{ "{start}" {path}{{1,{k}}} ?x . }}'
            expected = reach({start}, undirected, k)
        got = {row.x for row in sparql_select(tdf, q).collect()}
        assert got == expected, f"case {case}: {q}"


def test_sparql_zero_paths_random_vs_python_bfs(spark):
    """Zero-capable modifiers (``*``, ``?``, ``{0,k}``) against a Python
    BFS plus the SPARQL 1.1 zero-frame: the seed itself when seeded, every
    graph node when both ends are variables."""
    rng = _mk_rng()
    edges = sorted(
        {(rng.choice(_NODES), "e", rng.choice(_NODES)) for _ in range(25)}
    )
    tdf = spark.createDataFrame(
        edges, "subj string, pred string, obj string"
    ).cache()
    tdf.count()
    fwd = {(s, o) for s, _, o in edges}
    nodes = {s for s, _ in fwd} | {o for _, o in fwd}

    def reach(start, step, k):
        frontier, seen = {start}, set()
        for _ in range(k):
            frontier = {b for a, b in step if a in frontier} - seen
            if not frontier:
                break
            seen |= frontier
        return seen

    for case in range(8):
        mod, k = rng.choice([("*", 6), ("?", 1), ("{0,2}", 2)])
        flip = rng.random() < 0.5
        start = rng.choice(sorted(nodes))
        if flip:
            q = f'SELECT ?x WHERE {{ ?x <e>{mod} "{start}" . }}'
            step = {(b, a) for a, b in fwd}
        else:
            q = f'SELECT ?x WHERE {{ "{start}" <e>{mod} ?x . }}'
            step = fwd
        expected = reach(start, step, k) | {start}
        got = {row.x for row in sparql_select(tdf, q).collect()}
        assert got == expected, f"case {case}: {q}"

def test_sparql_filter_arithmetic_random_vs_python(spark):
    """Random arithmetic FILTER comparisons over part-numeric terms vs a
    Python mirror of the documented semantics: operands cast value-wise
    to float, non-numeric terms become None, any None in an arithmetic
    or comparison yields an unsatisfied filter (NULL drops the row)."""
    rng = _mk_rng()
    vals = [str(v) for v in range(-3, 9)] + ["x", "y", ""]
    triples = sorted(
        {
            (f"s{i}", p, rng.choice(vals))
            for i in range(12)
            for p in ("pa", "pb")
        }
    )
    tdf = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    ).cache()
    tdf.count()
    rows = {}
    for s, p, o in triples:
        rows.setdefault(s, {})[p] = o

    def num(t):
        try:
            return float(t)
        except ValueError:
            return None

    ops = {
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
        "*": lambda a, b: a * b,
        "/": lambda a, b: (a / b) if b != 0 else None,
    }
    cmps = {
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
    }
    for case in range(10):
        aop = rng.choice(list(ops))
        cop = rng.choice(list(cmps))
        lit = str(rng.randint(-2, 12))
        q = (
            "SELECT ?s WHERE { ?s <pa> ?a . ?s <pb> ?b . "
            f"FILTER(?a {aop} ?b {cop} {lit}) }}"
        )
        expected = set()
        for s, d in rows.items():
            if "pa" not in d or "pb" not in d:
                continue
            a, b = num(d["pa"]), num(d["pb"])
            if a is None or b is None:
                continue
            v = ops[aop](a, b)
            if v is not None and cmps[cop](v, float(lit)):
                expected.add(s)
        got = {r.s for r in sparql_select(tdf, q).collect()}
        assert got == expected, f"case {case}: {q}"


def test_sparql_negated_sets_random_vs_python(spark):
    """Negated property sets against a direct Python evaluation: forward
    edges outside the forward set ∪ reversed edges outside the inverse
    set, each branch only when present."""
    rng = _mk_rng()
    triples = sorted(
        {
            (rng.choice(_NODES), rng.choice(_PREDS), rng.choice(_NODES))
            for _ in range(40)
        }
    )
    tdf = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    ).cache()
    tdf.count()

    def nps_step(fwd, inv):
        out = set()
        if fwd is not None:
            out |= {(s, o) for s, p, o in triples if p not in fwd}
        if inv is not None:
            out |= {(o, s) for s, p, o in triples if p not in inv}
        return out

    for case in range(8):
        n_fwd = rng.randint(0, 2)
        n_inv = rng.randint(0 if n_fwd else 1, 2)
        fwd = tuple(rng.sample(_PREDS, n_fwd)) or None
        inv = tuple(rng.sample(_PREDS, n_inv)) or None
        elems = [f"<{p}>" for p in (fwd or ())] + [
            f"^<{p}>" for p in (inv or ())
        ]
        nps = (
            f"!({'|'.join(elems)})" if len(elems) > 1
            else f"!{elems[0]}"
        )
        start = rng.choice(_NODES)
        q = f'SELECT ?x WHERE {{ "{start}" {nps} ?x . }}'
        expected = {b for a, b in nps_step(fwd, inv) if a == start}
        got = {row.x for row in sparql_select(tdf, q).collect()}
        assert got == expected, f"case {case}: {q}"


def test_sparql_zero_paths_unseeded_star(spark):
    rng = _mk_rng()
    edges = sorted(
        {(rng.choice(_NODES), "e", rng.choice(_NODES)) for _ in range(25)}
    )
    tdf = spark.createDataFrame(
        edges, "subj string, pred string, obj string"
    ).cache()
    tdf.count()
    fwd = {(s, o) for s, _, o in edges}
    nodes = {s for s, _ in fwd} | {o for _, o in fwd}

    def reach(start, step, k):
        frontier, seen = {start}, set()
        for _ in range(k):
            frontier = {b for a, b in step if a in frontier} - seen
            if not frontier:
                break
            seen |= frontier
        return seen

    # unseeded star: closure pairs plus (n, n) for every graph node
    q = "SELECT ?s ?x WHERE { ?s <e>* ?x . }"
    closure = set()
    for n in nodes:
        closure |= {(n, m) for m in reach(n, fwd, len(nodes))}
    expected_pairs = closure | {(n, n) for n in nodes}
    got_pairs = {(r.s, r.x) for r in sparql_select(tdf, q).collect()}
    assert got_pairs == expected_pairs


def test_sparql_aggregates_having_random_vs_python(spark):
    """Random GROUP BY + COUNT/MIN/GROUP_CONCAT/SAMPLE + HAVING vs a
    pure-Python grouping over the same distinct binding rows. The
    aggregates run over the *full* binding rows (set semantics), so the
    reference groups the _eval_patterns dicts, not distinct (g, a)
    pairs — duplicated ?a values across rows stay in GROUP_CONCAT."""
    rng = _mk_rng()
    triples = _random_triples(rng)
    tdf = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    ).cache()
    tdf.count()

    n_nonempty = 0
    for case in range(12):
        patterns = _gen_chain(rng)
        variables = _bound_vars(patterns)
        if len(variables) < 2:
            continue
        g, a = rng.sample(variables, 2)
        k = rng.randint(1, 2)
        query = (
            f"SELECT ?{g} (COUNT(?{a}) AS ?cnt) (MIN(?{a}) AS ?mn) "
            f'(GROUP_CONCAT(?{a} ; SEPARATOR="|") AS ?cc) '
            f"(SAMPLE(?{a}) AS ?sm) "
            "WHERE { " + _render_patterns(patterns) + " } "
            f"GROUP BY ?{g} HAVING (?cnt >= {k})"
        )
        groups: dict = {}
        for b in _eval_patterns(triples, patterns):
            groups.setdefault(b[g], []).append(b[a])
        expected = {
            (gv, len(vals), min(vals), "|".join(sorted(vals)), min(vals))
            for gv, vals in groups.items()
            if len(vals) >= k
        }
        got = {
            (r[g], r["cnt"], r["mn"], r["cc"], r["sm"])
            for r in sparql_select(tdf, query).collect()
        }
        assert got == expected, f"case {case}: {query}"
        n_nonempty += bool(expected)
    assert n_nonempty >= 5


def test_sparql_subquery_random_vs_python(spark):
    """Random subqueries (plain-projection and aggregate+HAVING forms)
    joined to a random outer chain on the shared variable, vs a
    pure-Python bottom-up evaluation. COUNT in the inner select counts
    distinct (join-var, ?sw) binding rows — BGP set semantics."""
    rng = _mk_rng()
    triples = _random_triples(rng)
    tdf = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    ).cache()
    tdf.count()

    n_nonempty = 0
    for case in range(12):
        patterns = _gen_chain(rng)
        variables = _bound_vars(patterns)
        jv = rng.choice(variables)
        ipred = rng.choice(_PREDS)
        use_agg = rng.random() < 0.6
        if use_agg:
            k = rng.randint(1, 2)
            sub = (
                f"{{ SELECT ?{jv} (COUNT(?sw) AS ?n) WHERE {{ "
                f"?{jv} {ipred} ?sw . }} GROUP BY ?{jv} "
                f"HAVING (?n >= {k}) }}"
            )
            proj = [jv, "n"]
        else:
            sub = f"{{ SELECT ?{jv} WHERE {{ ?{jv} {ipred} ?sw . }} }}"
            proj = [jv]
        query = (
            "SELECT DISTINCT "
            + " ".join(f"?{v}" for v in proj)
            + " WHERE { "
            + _render_patterns(patterns)
            + " "
            + sub
            + " }"
        )
        outer = _eval_patterns(triples, patterns)
        fanout: dict = {}
        for ts, tp, to in triples:
            if tp == ipred:
                fanout.setdefault(ts, set()).add(to)
        if use_agg:
            counts = {s: len(o) for s, o in fanout.items() if len(o) >= k}
            expected = {
                (b[jv], counts[b[jv]]) for b in outer if b[jv] in counts
            }
        else:
            expected = {(b[jv],) for b in outer if b[jv] in fanout}
        got = {
            tuple(r[v] for v in proj)
            for r in sparql_select(tdf, query).collect()
        }
        assert got == expected, f"case {case}: {query}"
        n_nonempty += bool(expected)
    assert n_nonempty >= 5


def test_sparql_projection_exprs_random_vs_python(spark):
    """Random ( expr AS ?alias ) projection expressions over random BGP
    bindings vs a Python mirror — covers the expression grammar end to
    end (UCASE/LCASE, STRLEN arithmetic, STRBEFORE/STRAFTER, MD5,
    CONCAT, FLOOR) through the tokenizer, parser and column compiler."""
    import hashlib

    rng = _mk_rng()
    triples = _random_triples(rng)
    tdf = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    ).cache()
    tdf.count()

    def gen_expr(rng, v, alias):
        kind = rng.choice(
            ["ucase", "lcase", "len_arith", "before", "after", "md5",
             "concat", "floor"]
        )
        if kind == "ucase":
            return f"(UCASE(?{v}) AS ?{alias})", lambda b: b[v].upper()
        if kind == "lcase":
            return f"(LCASE(?{v}) AS ?{alias})", lambda b: b[v].lower()
        if kind == "len_arith":
            k = rng.randint(1, 5)
            return (
                f"(STRLEN(?{v}) * 2 + {k} AS ?{alias})",
                lambda b, k=k: float(len(b[v]) * 2 + k),
            )
        if kind == "before":
            c = rng.choice(["n", "1", "z"])
            return (
                f'(STRBEFORE(?{v}, "{c}") AS ?{alias})',
                lambda b, c=c: b[v][: b[v].index(c)] if c in b[v] else "",
            )
        if kind == "after":
            c = rng.choice(["n", "2", "z"])
            return (
                f'(STRAFTER(?{v}, "{c}") AS ?{alias})',
                lambda b, c=c: (
                    b[v][b[v].index(c) + 1:] if c in b[v] else ""
                ),
            )
        if kind == "md5":
            return (
                f"(MD5(?{v}) AS ?{alias})",
                lambda b: hashlib.md5(b[v].encode()).hexdigest(),
            )
        if kind == "concat":
            return (
                f'(CONCAT(?{v}, ":", ?{v}) AS ?{alias})',
                lambda b: b[v] + ":" + b[v],
            )
        return (
            f"(FLOOR(STRLEN(?{v}) / 2) AS ?{alias})",
            lambda b: float(len(b[v]) // 2),
        )

    for case in range(10):
        patterns = _gen_chain(rng)
        variables = _bound_vars(patterns)
        keep = rng.choice(variables)
        exprs = [gen_expr(rng, rng.choice(variables), f"e{i}")
                 for i in range(rng.randint(1, 3))]
        frag = " ".join(f for f, _ in exprs)
        q = (f"SELECT ?{keep} {frag} WHERE "
             f"{{ {_render_patterns(patterns)} }}")
        expected = {
            tuple([b[keep]] + [fn(b) for _, fn in exprs])
            for b in _eval_patterns(triples, patterns)
        }
        got = {tuple(r) for r in sparql_select(tdf, q).collect()}
        assert got == expected, f"case {case}: {q}"
