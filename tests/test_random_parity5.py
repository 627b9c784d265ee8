"""Seeded randomized parity, batch 5: anchor-prior linking, IOB span
extraction with malformed streams, URL canonicalization, and statistical
boilerplate marking — each against an independent pure-Python
reconstruction of the documented semantics."""

from __future__ import annotations

import math
import random
import re


def _mk_rng():
    return random.Random(20260823)


def test_anchor_prior_dictionary_random_vs_python(spark):
    from search_spark.operators.linkgraph import anchor_prior_dictionary

    rng = _mk_rng()
    targets = [f"https://kb.example/e{i}" for i in range(6)]
    anchor_texts = ["Alpha Beta", "alpha  beta", "Gamma", " gamma ", "Delta"]
    pages = []
    # python-side edge reconstruction: (norm_anchor, dst) multiset
    from collections import Counter, defaultdict

    edge_count: Counter = Counter()
    for i in range(40):
        src = f"https://h{i % 5}.example/d/p{i}"
        anchors = []
        for _ in range(rng.randint(0, 4)):
            text = rng.choice(anchor_texts)
            kind = rng.random()
            if kind < 0.5:
                href = rng.choice(targets)
                dst = href
            elif kind < 0.8:
                href = f"/local/{rng.randint(0, 2)}"
                dst = f"https://h{i % 5}.example{href}"
            else:
                href = f"rel{rng.randint(0, 2)}.html"
                dst = f"https://h{i % 5}.example/d/{href}"
            q = rng.choice(['"', "'"])
            extra = rng.choice(["", ' class="x"', " data-k='1'"])
            pre = rng.choice(["", ' target="_blank"'])
            anchors.append(f"<a{pre} href={q}{href}{q}{extra}>{text}</a>")
            norm = re.sub(r"\s+", " ", text.strip().lower())
            if norm:
                edge_count[(norm, dst)] += 1
        html = f"<html><body>{''.join(anchors)}</body></html>"
        pages.append((src, html.encode()))

    totals: dict = defaultdict(int)
    for (anchor, _dst), n in edge_count.items():
        totals[anchor] += n
    expected = {}
    for anchor in totals:
        cands = [
            (n, dst) for (a, dst), n in edge_count.items() if a == anchor
        ]
        best_n = max(n for n, _ in cands)
        dst = min(d for n, d in cands if n == best_n)
        expected[anchor] = (
            dst,
            best_n,
            totals[anchor],
            math.floor(best_n * 1_000_000 / totals[anchor]),
        )

    df = spark.createDataFrame(pages, schema="url string, html binary")
    got = {
        r.anchor: (r.dst, r.n_links, r.n_total, r.prior_ppm)
        for r in anchor_prior_dictionary(df).collect()
    }
    assert got == expected


def test_spans_from_iob_random_vs_python(spark):
    # random IOB streams with orphan I- tokens, B-B adjacency, and type
    # switches: spans are B-initiated maximal runs; orphan I-runs drop
    # without shifting later spans
    from search_spark.operators.evaluation import spans_from_iob

    rng = _mk_rng()
    tags = ["O", "B-PER", "I-PER", "B-LOC", "I-LOC"]
    rows = []
    for doc in range(12):
        for i in range(rng.randint(5, 30)):
            rows.append((f"d{doc}", i, rng.choice(tags)))

    expected = set()
    from collections import defaultdict

    by_doc = defaultdict(list)
    for d, i, tag in rows:
        by_doc[d].append((i, tag))
    for d, toks in by_doc.items():
        toks.sort()
        open_spans: dict = {}  # etype -> [start, end, head_is_b]
        prev_tag = "O"
        for i, tag in toks:
            closed = set(open_spans)  # close everything not continued
            if tag.startswith("B-"):
                et = tag[2:]
                if et in open_spans:
                    s, e, headb = open_spans.pop(et)
                    if headb:
                        expected.add((d, et, s, e))
                open_spans[et] = [i, i, True]
                closed.discard(et)  # freshly opened
            elif tag.startswith("I-"):
                et = tag[2:]
                cont = prev_tag in (f"B-{et}", f"I-{et}")
                if cont and et in open_spans:
                    open_spans[et][1] = i
                    closed.discard(et)
                else:
                    if et in open_spans:
                        s, e, headb = open_spans.pop(et)
                        if headb:
                            expected.add((d, et, s, e))
                    open_spans[et] = [i, i, False]  # orphan segment
                    closed.discard(et)
            for et in closed:
                s, e, headb = open_spans.pop(et)
                if headb:
                    expected.add((d, et, s, e))
            prev_tag = tag
        for et, (s, e, headb) in open_spans.items():
            if headb:
                expected.add((d, et, s, e))

    df = spark.createDataFrame(rows, schema="doc string, pos int, iob string")
    got = {
        (r.doc, r.entity_type, r.start, r.end)
        for r in spans_from_iob(df, "iob", "pos", ["doc"]).collect()
    }
    assert got == expected


def test_canonical_url_random_vs_python(spark):
    from search_spark.operators.urls import canonical_url_col
    from pyspark.sql import functions as F

    rng = _mk_rng()
    hosts = ["Site.Example", "www.site.example", "shop.example"]
    params = ["a=1", "b=2", "utm_source=x", "utm_campaign=Spring", "xutm_a=b",
              "utm_1=digit", "c=3"]
    urls = []
    for i in range(200):
        scheme = rng.choice(["http", "https"])
        host = rng.choice(hosts)
        path = "/" + "/".join(
            rng.choice(["A", "b", "c2"]) for _ in range(rng.randint(0, 3))
        )
        qs = "&".join(rng.sample(params, rng.randint(0, 4)))
        frag = rng.choice(["", "#Top", "#sec-2"])
        trail = rng.choice(["", "/"])
        url = f"{scheme}://{host}{path.rstrip('/')}{trail}"
        if qs:
            url += f"?{qs}"
        url += frag
        urls.append((url,))

    def ref(url):
        u = url.lower()
        u = u.split("#", 1)[0]
        if "?" in u:
            base, qs = u.split("?", 1)
            kept = [p for p in qs.split("&")
                    if not re.match(r"utm_[a-z]+=", p)]
            u = base + ("?" + "&".join(kept) if any(kept) else "")
            u = re.sub(r"[?&]+$", "", u.replace("?&", "?"))
        u = re.sub(r"^https?://(www\.)?", "", u)
        u = re.sub(r"/$", "", u)
        return u

    df = spark.createDataFrame(urls, schema="url string").withColumn(
        "canon", canonical_url_col("url")
    )
    got = {r.url: r.canon for r in df.collect()}
    for (url,) in urls:
        assert got[url] == ref(url), (url, got[url], ref(url))


def test_mark_boilerplate_random_vs_python(spark):
    from search_spark.operators.boilerplate import mark_boilerplate

    rng = _mk_rng()
    banners = ["Accept Cookies", "accept   cookies", "Subscribe now!"]
    bodies = [f"unique para {i}" for i in range(50)]
    rows = []
    for h in range(3):
        n_docs = rng.randint(2, 8)
        for d in range(n_docs):
            url = f"https://h{h}.example/doc{d}"
            for ppos in range(rng.randint(1, 5)):
                text = (
                    rng.choice(banners)
                    if rng.random() < 0.4
                    else rng.choice(bodies)
                )
                rows.append((url, ppos, text))

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    from collections import defaultdict

    docs_by_host = defaultdict(set)
    df_by_key = defaultdict(set)
    for url, _p, text in rows:
        host = url.split("://")[1].split("/")[0]
        docs_by_host[host].add(url)
        df_by_key[(host, norm(text))].add(url)
    ratio, min_df = 0.5, 2
    expected = {}
    for url, ppos, text in rows:
        host = url.split("://")[1].split("/")[0]
        df_n = len(df_by_key[(host, norm(text))])
        flag = df_n >= min_df and df_n >= len(docs_by_host[host]) * ratio
        expected[(url, ppos)] = flag

    df = spark.createDataFrame(
        rows, schema="url string, ppos int, text string"
    )
    got = {
        (r.url, r.ppos): r.is_boilerplate
        for r in mark_boilerplate(df).collect()
    }
    assert got == expected


def test_sameas_rewrite_random_vs_python(spark):
    """Random sameAs graphs + random triples vs an independent union-find
    mirror: component representative = lexicographic min, subject AND
    object rewritten, n_sources = distinct original subjects per fact."""
    from collections import defaultdict

    from search_spark.operators.canonicalize import sameas_rewrite

    rng = _mk_rng()
    for trial in range(4):
        nodes = [f"n{i:02d}" for i in range(rng.randint(4, 14))]
        pairs = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randint(0, 12))
            }
        )
        preds = ["p", "q", "r"]
        # objects mix literals and node ids (object-side rewrite matters)
        objs = ["lit1", "lit2"] + nodes[:3]
        triples = [
            (rng.choice(nodes), rng.choice(preds), rng.choice(objs))
            for _ in range(rng.randint(1, 40))
        ]

        # python mirror: union-find with min-representative
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo

        def rep(x):
            return find(x) if x in parent else x

        expected_sources = defaultdict(set)
        for s, p, o in triples:
            expected_sources[(rep(s), p, rep(o))].add(s)
        expected = {k: len(v) for k, v in expected_sources.items()}

        t_df = spark.createDataFrame(
            triples, schema="subj string, pred string, obj string"
        )
        p_df = spark.createDataFrame(
            pairs or [("zz_lonely", "zz_lonely2")],
            schema="a string, b string",
        )
        if not pairs:
            expected = {
                k: v for k, v in expected.items()
            }  # lone dummy pair touches no triple node
        got = {
            (r.subj, r.pred, r.obj): r.n_sources
            for r in sameas_rewrite(t_df, p_df).collect()
        }
        assert got == expected, f"trial {trial}"
