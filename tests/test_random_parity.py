"""Seeded randomized parity: one Spark job over a random batch vs an
independent pure-Python reference implementation. Catches the edge cases
hand-picked fixtures miss (odd prefixes, ties, singleton groups) at
one-job cost — the Spark-appropriate analogue of the per-example
hypothesis tests in test_properties.py."""

from __future__ import annotations

import hashlib
import random


def _mk_rng():
    return random.Random(20260819)


def test_robots_random_rules_vs_python_reference(spark):
    from search_spark.operators.crawl import robots_allowed

    rng = _mk_rng()
    segs = ["a", "b", "pub", "private", "tmp", "x1"]
    hosts = [f"h{i}.example" for i in range(6)]  # h5 gets no robots row

    def rand_path(depth):
        return "/" + "/".join(rng.choice(segs) for _ in range(depth)) + (
            "/" if rng.random() < 0.5 else ""
        )

    robots_rows, rules_by_host = [], {}
    for h in hosts[:5]:
        lines, rules = ["User-agent: *"], []
        for _ in range(rng.randint(1, 6)):
            kind = rng.choice(["Allow", "Disallow"])
            prefix = rand_path(rng.randint(1, 3))
            lines.append(f"{kind}: {prefix}")
            rules.append((kind == "Allow", prefix))
        if rng.random() < 0.3:
            lines.append("Disallow:")  # empty = allow-all no-op
        robots_rows.append((f"https://{h}/robots.txt",
                            "\n".join(lines).encode()))
        rules_by_host[h] = rules
    cand_rows = [
        (f"https://{rng.choice(hosts)}{rand_path(rng.randint(1, 4))}",)
        for _ in range(300)
    ]

    def ref_decision(url):
        host = url.split("://")[1].split("/")[0]
        path = "/" + url.split("://")[1].split("/", 1)[1] if "/" in url.split(
            "://")[1] else "/"
        best = None  # (len, allow, prefix)
        for allow, prefix in rules_by_host.get(host, []):
            if path.startswith(prefix):
                n = len(prefix)
                if best is None or n > best[0] or (
                    n == best[0] and allow and not best[1]
                ):
                    best = (n, allow, prefix)
        if best is None:
            return True, None
        return best[1], best[2]

    robots = spark.createDataFrame(
        robots_rows, schema="url string, html binary"
    )
    cand = spark.createDataFrame(cand_rows, schema="url string")
    got = {
        r.url: r.matched_prefix
        for r in robots_allowed(cand, robots).collect()
    }
    for (url,) in set(cand_rows):
        allowed, prefix = ref_decision(url)
        if allowed:
            assert url in got and got[url] == prefix, (url, prefix,
                                                       got.get(url))
        else:
            assert url not in got, url


def test_robots_random_user_agent_groups_vs_python_reference(spark):
    # random MULTI-GROUP robots files: named groups must not apply to *,
    # multi-header groups apply when any header is *, pre-group rules are
    # ignored
    from search_spark.operators.crawl import robots_allowed

    rng = _mk_rng()
    segs = ["a", "b", "pub", "private", "tmp", "x1"]
    hosts = [f"g{i}.example" for i in range(6)]
    agents = ["*", "alphabot", "betabot"]

    def rand_path(depth):
        return "/" + "/".join(rng.choice(segs) for _ in range(depth)) + (
            "/" if rng.random() < 0.5 else ""
        )

    robots_rows, rules_by_host = [], {}
    for h in hosts[:5]:
        lines, star_rules = [], []
        if rng.random() < 0.4:  # stray pre-group rule: must be ignored
            lines.append(f"Disallow: {rand_path(1)}")
        for _ in range(rng.randint(1, 3)):  # groups
            headers = [rng.choice(agents) for _ in range(rng.randint(1, 2))]
            lines += [f"User-agent: {a}" for a in headers]
            for_us = "*" in headers
            for _ in range(rng.randint(1, 4)):
                kind = rng.choice(["Allow", "Disallow"])
                prefix = rand_path(rng.randint(1, 3))
                lines.append(f"{kind}: {prefix}")
                if for_us:
                    star_rules.append((kind == "Allow", prefix))
        robots_rows.append(
            (f"https://{h}/robots.txt", "\n".join(lines).encode())
        )
        rules_by_host[h] = star_rules
    cand_rows = [
        (f"https://{rng.choice(hosts)}{rand_path(rng.randint(1, 4))}",)
        for _ in range(300)
    ]

    def ref_decision(url):
        host = url.split("://")[1].split("/")[0]
        rest = url.split("://")[1]
        path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
        best = None
        for allow, prefix in rules_by_host.get(host, []):
            if path.startswith(prefix):
                n = len(prefix)
                if best is None or n > best[0] or (
                    n == best[0] and allow and not best[1]
                ):
                    best = (n, allow, prefix)
        if best is None:
            return True, None
        return best[1], best[2]

    robots = spark.createDataFrame(
        robots_rows, schema="url string, html binary"
    )
    cand = spark.createDataFrame(cand_rows, schema="url string")
    got = {
        r.url: r.matched_prefix
        for r in robots_allowed(cand, robots).collect()
    }
    for (url,) in set(cand_rows):
        allowed, prefix = ref_decision(url)
        if allowed:
            assert url in got and got[url] == prefix, (url, prefix,
                                                       got.get(url))
        else:
            assert url not in got, url


def test_pair_contexts_random_vs_python_reference(spark):
    # random token streams + mention positions: middles must be the exact
    # strictly-between token runs, '' for adjacent pairs, one row per
    # ordered pair within the window
    from search_spark.operators.bootstrap import pair_contexts

    rng = _mk_rng()
    window = 4
    vocab = ["t%d" % i for i in range(12)]
    tok_rows, men_rows = [], []
    mentions_by_doc = {}
    toks_by_doc = {}
    for d in range(25):
        n = rng.randint(2, 18)
        toks = [rng.choice(vocab) for _ in range(n)]
        toks_by_doc[d] = toks
        tok_rows += [(d, i, t) for i, t in enumerate(toks)]
        mpos = sorted(rng.sample(range(n), rng.randint(1, min(5, n))))
        mentions_by_doc[d] = mpos
        men_rows += [(d, p, toks[p].upper()) for p in mpos]

    expected = set()
    for d, mpos in mentions_by_doc.items():
        toks = toks_by_doc[d]
        for a in mpos:
            for b in mpos:
                if 1 <= b - a <= window:
                    middle = " ".join(toks[a + 1:b])
                    expected.add(
                        (d, a, b, toks[a].upper(), toks[b].upper(), middle)
                    )

    tokens = spark.createDataFrame(
        tok_rows, schema="doc_id int, tpos int, tok string"
    )
    mentions = spark.createDataFrame(
        men_rows, schema="doc_id int, tpos int, mention string"
    )
    got = {
        (r.doc_id, r.a_tpos, r.b_tpos, r.subj, r.obj, r.middle)
        for r in pair_contexts(tokens, mentions, window).collect()
    }
    assert got == expected


def test_global_rank_random_vs_sorted_enumerate(spark):
    from search_spark.operators.blocking import global_rank

    rng = _mk_rng()
    rows = [(i, rng.choice("abcdef") * rng.randint(1, 3)) for i in
            range(500)]
    df = spark.createDataFrame(rows, schema="id int, k string").repartition(
        13
    )
    got = {r.id: r.rank for r in global_rank(df, ["k", "id"]).collect()}
    expected = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1],
                                                                 t[0])))
    }
    assert got == expected


def test_rake_random_vs_python_reference(spark):
    from search_spark.operators.keywords import rake_keywords

    rng = _mk_rng()
    words = ["spark", "engine", "fast", "slow", "data", "join"]
    stops = ("the", "a")
    docs = []
    for d in range(40):
        toks = [
            rng.choice(words + list(stops) + ["the"])
            for _ in range(rng.randint(3, 25))
        ]
        docs.append((d, " ".join(toks)))

    # independent python RAKE (deg scoring)
    phrases_by_doc, deg = {}, {}
    for d, text in docs:
        runs, cur = [], []
        for tok in text.lower().split(" "):
            tok = tok.rstrip(".,;:!?")
            if tok in stops or tok == "":
                if cur:
                    runs.append(cur)
                cur = []
            else:
                cur.append(tok)
        if cur:
            runs.append(cur)
        phrases_by_doc[d] = runs
        for run in runs:
            for w in run:
                deg[w] = deg.get(w, 0) + len(run)
    expected = set()
    for d, runs in phrases_by_doc.items():
        cand = [
            (" ".join(r), len(r), sum(deg[w] for w in r))
            for r in runs
            if len(r) >= 2
        ]
        cand.sort(key=lambda t: (-t[2], t[0]))
        for rank, (p, n, s) in enumerate(cand[:3], 1):
            expected.add((d, p, n, s, rank))

    sdf = spark.createDataFrame(docs, schema="doc_id int, text string")
    got = {
        tuple(r)
        for r in rake_keywords(sdf, stops, top_k=3, min_len=2).collect()
    }
    assert got == expected


def test_transe_rank_random_vs_python_reference(spark):
    from search_spark.operators.kge import rank_tails

    rng = _mk_rng()
    ents = [f"e{i}" for i in range(12)]
    preds = ["p0", "p1"]
    triples = list(
        {
            (rng.choice(ents), rng.choice(preds), rng.choice(ents))
            for _ in range(30)
        }
    )

    def emb(name):
        return [int(c, 16) for c in
                hashlib.md5(name.encode()).hexdigest()[:16]]

    def energy(s, p, o):
        return sum(
            abs(a + b - c) for a, b, c in zip(emb(s), emb(p), emb(o))
        )

    cands = sorted({o for _, _, o in triples})
    expected = {}
    for s, p, o in triples:
        e_true = energy(s, p, o)
        rank = 1 + sum(
            1
            for c in cands
            if c != o
            and (
                energy(s, p, c) < e_true
                or (energy(s, p, c) == e_true and c < o)
            )
        )
        expected[(s, p, o)] = (e_true, rank, len(cands) - 1)

    tdf = spark.createDataFrame(
        triples, schema="subj string, pred string, obj string"
    )
    cdf = spark.createDataFrame([(c,) for c in cands],
                                schema="entity string")
    got = {
        (r.subj, r.pred, r.obj): (r.energy, r.rank, r.n_candidates)
        for r in rank_tails(tdf, cdf).collect()
    }
    assert got == expected


def test_kge_model_trio_rank_random_vs_python_reference(spark):
    """All three MODELS entries through the same randomized ranking
    parity: TransE (asc energy), DistMult (desc bilinear), ComplEx
    (desc Re(h∘r·conj(t)) over packed re‖im digits)."""
    from search_spark.operators.kge import rank_tails

    rng = _mk_rng()
    ents = [f"v{i}" for i in range(10)]
    preds = ["q0", "q1", "q2"]
    triples = list(
        {
            (rng.choice(ents), rng.choice(preds), rng.choice(ents))
            for _ in range(25)
        }
    )

    def digits(name, n=32):
        return [int(c, 16) for c in
                hashlib.md5(name.encode()).hexdigest()[:n]]

    def score(model, s, p, o):
        if model == "transe":
            return sum(
                abs(a + b - c)
                for a, b, c in zip(digits(s, 16), digits(p, 16),
                                   digits(o, 16))
            )
        if model == "distmult":
            return sum(
                a * b * c
                for a, b, c in zip(digits(s, 16), digits(p, 16),
                                   digits(o, 16))
            )
        def cx(n):
            d = digits(n)
            return [complex(re, im) for re, im in zip(d[:16], d[16:])]
        return int(sum(
            (a * b * c.conjugate()).real
            for a, b, c in zip(cx(s), cx(p), cx(o))
        ))

    cands = sorted({o for _, _, o in triples})
    tdf = spark.createDataFrame(
        triples, schema="subj string, pred string, obj string"
    )
    cdf = spark.createDataFrame([(c,) for c in cands],
                                schema="entity string")
    for model, hib in (("transe", False), ("distmult", True),
                       ("complex", True)):
        expected = {}
        for s, p, o in triples:
            e_true = score(model, s, p, o)
            rank = 1 + sum(
                1
                for c in cands
                if c != o
                and (
                    (score(model, s, p, c) > e_true if hib
                     else score(model, s, p, c) < e_true)
                    or (score(model, s, p, c) == e_true and c < o)
                )
            )
            expected[(s, p, o)] = (e_true, rank, len(cands) - 1)
        got = {
            (r.subj, r.pred, r.obj): (r.energy, r.rank, r.n_candidates)
            for r in rank_tails(tdf, cdf, model=model).collect()
        }
        assert got == expected, model
