"""Seeded randomized parity, batch 2: fusion resolution, property paths,
coreference, sorted-neighborhood blocking, IFP candidates, shape
validation. Same discipline as test_random_parity.py — one Spark job over
a random batch vs an independent pure-Python reference — aimed at the tie
/ NULL / revisit edge cases the hand-picked oracle fixtures can't cover
densely."""

from __future__ import annotations

import random


def _mk_rng():
    return random.Random(20260820)


def test_resolve_functional_random_vs_python_argmax(spark):
    # random evidence from 3 extractors with heavy (subj, pred) collisions
    # so ties on n_sources/n_prov actually occur and the priority +
    # lexicographic tie-breaks are exercised
    from search_spark.operators.fusion import fuse_and_resolve

    rng = _mk_rng()
    names = ["alpha", "beta", "gamma"]
    subjects = [f"s{i}" for i in range(8)]
    preds = ["color", "size"]
    objs = [f"v{i}" for i in range(4)]
    per_source: dict[str, list[tuple]] = {n: [] for n in names}
    for _ in range(400):
        per_source[rng.choice(names)].append(
            (rng.choice(subjects), rng.choice(preds), rng.choice(objs))
        )

    # python reference: per (s, p, o) count rows / distinct sources / best
    # (lowest) priority, then argmax by (n_sources, n_prov, -priority)
    # with lexicographic-min obj on full ties
    from collections import defaultdict

    stats: dict[tuple, list] = defaultdict(lambda: [0, set(), len(names)])
    for prio, name in enumerate(names):
        for row in per_source[name]:
            st = stats[row]
            st[0] += 1
            st[1].add(name)
            st[2] = min(st[2], prio)
    by_key: dict[tuple, list[tuple]] = defaultdict(list)
    for (s, p, o), (n_prov, srcs, prio) in stats.items():
        by_key[(s, p)].append((len(srcs), n_prov, -prio, o))
    expected = set()
    for (s, p), cands in by_key.items():
        best = max(c[:3] for c in cands)
        obj = min(c[3] for c in cands if c[:3] == best)
        expected.add((s, p, obj, best[0], best[1]))

    sources = [
        (
            name,
            spark.createDataFrame(
                per_source[name], schema="subj string, pred string, obj string"
            ),
        )
        for name in names
    ]
    got = {
        (r.subj, r.pred, r.obj, r.n_sources, r.n_prov)
        for r in fuse_and_resolve(sources).collect()
    }
    assert got == expected


def test_eval_path_random_vs_python_walks(spark):
    # random graph; path = (A | ^A){1,3} / B with a random seed set —
    # checks the semi-naive pair loop against plain frontier expansion
    # (walks, not simple paths), including odd/even revisits and seeds
    # with no outgoing edges
    from search_spark.operators.paths import (
        Alt,
        Inv,
        Pred,
        Repeat,
        Seq,
        eval_path,
    )

    rng = _mk_rng()
    nodes = [f"n{i}" for i in range(14)]
    a_edges = {
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(30)
    }
    b_edges = {
        (rng.choice(nodes), f"T{rng.randint(0, 2)}") for _ in range(12)
    }
    triples = [(s, "A", o) for s, o in a_edges] + [
        (s, "B", o) for s, o in b_edges
    ]
    seeds = sorted(rng.sample(nodes, 5))

    adj: dict[str, set] = {}
    for s, o in a_edges:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    b_map: dict[str, set] = {}
    for s, o in b_edges:
        b_map.setdefault(s, set()).add(o)
    expected = set()
    for seed in seeds:
        frontier, reach = {seed}, set()
        for _ in range(3):
            frontier = {x for f in frontier for x in adj.get(f, ())}
            reach |= frontier
        for mid in reach:
            for dst in b_map.get(mid, ()):
                expected.add((seed, dst))

    t = spark.createDataFrame(
        triples, schema="subj string, pred string, obj string"
    )
    src = spark.createDataFrame([(s,) for s in seeds], schema="src string")
    path = Seq(Repeat(Alt(Pred("A"), Inv(Pred("A"))), 3), Pred("B"))
    got = {(r.src, r.dst) for r in eval_path(t, path, src).collect()}
    assert got == expected


def test_resolve_pronouns_random_vs_python_scan(spark):
    # random documents with interleaved mentions and pronouns (incl.
    # trailing punctuation, pronouns before any mention, mention and
    # pronoun in the same sentence) vs a linear python scan
    from search_spark.operators.coref import (
        PLURAL_PRONOUNS,
        SINGULAR_PRONOUNS,
        resolve_pronouns,
    )

    rng = _mk_rng()
    fillers = ["the", "report", "notes", "growth", "in", "spring"]
    pronouns = list(SINGULAR_PRONOUNS) + list(PLURAL_PRONOUNS)
    entities = ["Alice", "Bob", "TeamX", "Crows"]
    sent_rows, mention_rows = [], []
    for doc in range(8):
        doc_id = f"d{doc}"
        for sent in range(rng.randint(1, 4)):
            toks, n = [], rng.randint(3, 9)
            for pos in range(n):
                roll = rng.random()
                if roll < 0.25:
                    ent = rng.choice(entities)
                    toks.append(ent)
                    mention_rows.append(
                        (doc_id, sent, pos, ent, ent in ("TeamX", "Crows"))
                    )
                elif roll < 0.5:
                    p = rng.choice(pronouns)
                    toks.append(p + rng.choice(["", ".", ",", "!"]))
                else:
                    toks.append(rng.choice(fillers))
            sent_rows.append((doc_id, sent, " ".join(toks)))

    # python reference: per doc, walk tokens in order; mentions update
    # state AFTER the current token is classified (the window excludes
    # the current row)
    import re

    mention_at = {
        (d, s, p): (e, pl) for d, s, p, e, pl in mention_rows
    }
    expected = set()
    by_doc: dict[str, list] = {}
    for d, s, text in sent_rows:
        by_doc.setdefault(d, []).append((s, text))
    for d, sents in by_doc.items():
        last_sing, last_plur = None, None
        for s, text in sorted(sents):
            for p, tok in enumerate(text.split(" ")):
                word = re.sub(r"[.,;:!?]+$", "", tok).lower()
                if word in SINGULAR_PRONOUNS and last_sing is not None:
                    expected.add((d, s, p, word, last_sing))
                elif word in PLURAL_PRONOUNS and last_plur is not None:
                    expected.add((d, s, p, word, last_plur))
                m = mention_at.get((d, s, p))
                if m is not None:
                    if m[1]:
                        last_plur = m[0]
                    else:
                        last_sing = m[0]

    sentences = spark.createDataFrame(
        sent_rows, schema="doc_id string, sent_pos int, text string"
    )
    mentions = spark.createDataFrame(
        mention_rows,
        schema="doc_id string, sent_pos int, tok_pos int, "
        "entity string, is_plural boolean",
    )
    got = {
        (r.doc_id, r.sent_pos, r.tok_pos, r.pronoun, r.antecedent)
        for r in resolve_pronouns(sentences, mentions).collect()
    }
    assert got == expected


def test_sorted_neighborhood_random_vs_python_window(spark):
    # duplicate keys on purpose: the id tie-break must make the pair set a
    # pure function of the input set
    from search_spark.operators.blocking import sorted_neighborhood_pairs

    rng = _mk_rng()
    rows = [
        (f"r{i}", rng.choice(["ann", "anna", "bob", "bobby", "carl"]))
        for i in range(60)
    ]
    window = 4
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    expected = {
        (order[i][0], order[i + g][0], order[i][1], order[i + g][1], g)
        for i in range(len(order))
        for g in range(1, window)
        if i + g < len(order)
    }
    df = spark.createDataFrame(rows, schema="id string, key string")
    got = {
        (r.a_id, r.b_id, r.a_key, r.b_key, r.rank_gap)
        for r in sorted_neighborhood_pairs(df, "id", "key", window).collect()
    }
    assert got == expected


def test_ifp_candidates_random_vs_python_pairs(spark):
    # hot keys above max_group must be purged wholesale, not truncated
    from itertools import combinations

    from search_spark.operators.blocking import ifp_candidates

    rng = _mk_rng()
    triples = []
    for _ in range(250):
        pred = rng.choice(["email", "isbn", "color"])
        obj = rng.choice(["k1", "k2", "k3", "hot", ""])
        triples.append((f"e{rng.randint(0, 25)}", pred, obj))
    # make "hot" actually hot for email
    triples += [(f"e{i}", "email", "hot") for i in range(12)]
    max_group = 6

    from collections import defaultdict

    groups = defaultdict(set)
    for s, p, o in triples:
        if p in ("email", "isbn") and o != "":
            groups[(p, o)].add(s)
    expected = set()
    for (p, o), subs in groups.items():
        if len(subs) > max_group:
            continue
        for a, b in combinations(sorted(subs), 2):
            expected.add((a, b, p, o))

    df = spark.createDataFrame(
        triples, schema="subj string, pred string, obj string"
    )
    got = {
        (r.a, r.b, r.pred, r.obj)
        for r in ifp_candidates(df, ["email", "isbn"], max_group).collect()
    }
    assert got == expected


def test_validate_shapes_random_vs_python_checker(spark):
    import re

    from search_spark.operators.shapes import Shape, validate_shapes

    rng = _mk_rng()
    people = [f"p{i}" for i in range(10)]
    triples = []
    for p in people:
        if rng.random() < 0.7:
            triples.append((p, "has_type", "Person"))
        for _ in range(rng.randint(0, 3)):
            triples.append((p, "knows", rng.choice(people)))
        if rng.random() < 0.8:
            triples.append(
                (p, "age", rng.choice(["7", "44", "old", "-3", "x9"]))
            )
    shapes = [
        Shape("knows-domain", "domain", "knows", cls="Person"),
        Shape("knows-range", "range", "knows", cls="Person"),
        Shape("min-knows", "min_count", "knows", cls="Person", lo=1),
        Shape("max-knows", "max_count", "knows", cls="Person", hi=2),
        Shape("age-num", "pattern", "age", regex=r"^[0-9]+$"),
    ]

    tset = set(triples)
    typed = {s for s, p, o in tset if p == "has_type" and o == "Person"}
    knows = {(s, o) for s, p, o in tset if p == "knows"}
    expected = set()
    for s in {s for s, _ in knows} - typed:
        expected.add(("knows-domain", s, "missing has_type Person"))
    for o in {o for _, o in knows} - typed:
        expected.add(("knows-range", o, "missing has_type Person"))
    from collections import Counter

    deg = Counter(s for s, _ in knows)
    for node in typed:
        n = deg.get(node, 0)
        if n < 1:
            expected.add(("min-knows", node, f"knows count {n}"))
        if n > 2:
            expected.add(("max-knows", node, f"knows count {n}"))
    for s, p, o in tset:
        if p == "age" and not re.match(r"^[0-9]+$", o):
            expected.add(("age-num", s, f"bad value {o}"))

    df = spark.createDataFrame(
        triples, schema="subj string, pred string, obj string"
    )
    got = {
        (r.shape, r.node, r.detail)
        for r in validate_shapes(df, shapes).collect()
    }
    assert got == expected
