"""Seeded randomized parity, batch 4: the link-graph operators — canonical
tag extraction over randomized markup, pointer-doubling chain resolution on
random graphs WITH cycles and cycle-draining tails, and hreflang
translation clusters vs a pure-Python connected-components pass."""

from __future__ import annotations

import random


def _mk_rng():
    return random.Random(20260822)


def test_canonical_links_random_markup_vs_python(spark):
    # random attribute order, quote style, distractor link tags, root-
    # relative hrefs, self-canonical pages (dropped), multiple canonical
    # tags (first in document order wins)
    from search_spark.operators.linkgraph import canonical_links

    rng = _mk_rng()
    pages, expected = [], {}
    for i in range(60):
        url = f"https://site{i % 7}.example/page{i}"
        host = f"site{i % 7}.example"
        tags = []
        canon_hrefs = []
        for _ in range(rng.randint(0, 3)):
            kind = rng.random()
            if kind < 0.4:
                href = rng.choice(
                    [
                        f"https://master.example/m{rng.randint(0, 9)}",
                        f"/canon/{rng.randint(0, 9)}",
                        url,  # self-canonical → dropped
                    ]
                )
                q = rng.choice(['"', "'"])
                attrs = [
                    f"rel={q}canonical{q}",
                    f"href={q}{href}{q}",
                ]
                rng.shuffle(attrs)
                tags.append(f"<link {' '.join(attrs)} data-x={q}1{q}>")
                canon_hrefs.append(href)
            elif kind < 0.7:
                tags.append(
                    f'<link rel="stylesheet" href="/css/{rng.randint(0, 5)}.css">'
                )
            else:
                tags.append('<link rel="alternate" href="/feed.xml">')
        html = f"<html><head>{''.join(tags)}</head><body>x</body></html>"
        pages.append((url, html.encode()))
        if canon_hrefs:
            href = canon_hrefs[0]  # first canonical tag wins
            if href.startswith("/"):
                href = f"https://{host}{href}"
            if href != url:
                expected[url] = href

    df = spark.createDataFrame(pages, schema="url string, html binary")
    got = {r.url: r.canonical for r in canonical_links(df).collect()}
    assert got == expected


def test_resolve_canonical_chains_random_vs_python_walk(spark):
    # random functional graph fragments: pure chains into terminals,
    # 2-cycles, longer cycles, and tails draining into cycles — resolved
    # must be the terminal for acyclic walks and NULL + is_cycle for
    # anything that revisits
    from search_spark.operators.linkgraph import resolve_canonical_chains

    rng = _mk_rng()
    nodes = [f"u{i}" for i in range(40)]
    terminals = [f"t{i}" for i in range(6)]
    links = {}
    for u in nodes:
        if rng.random() < 0.8:
            tgt = rng.choice(nodes + terminals)
            if tgt != u:  # canonical_links never emits self-links
                links[u] = tgt

    def walk(u):
        seen, cur = set(), u
        while cur in links:
            if cur in seen:
                return None, True
            seen.add(cur)
            cur = links[cur]
        return cur, False

    expected = {u: walk(u) for u in links}

    df = spark.createDataFrame(
        list(links.items()), schema="url string, canonical string"
    )
    got = {
        r.url: (r.resolved, r.is_cycle)
        for r in resolve_canonical_chains(df).collect()
    }
    assert got == expected


def test_hreflang_groups_random_vs_python_cc(spark):
    # partial / one-directional / inconsistent alternate declarations:
    # clusters must be the undirected connected components, group id =
    # lexicographic-min url; pages mentioned only as targets join the
    # component too
    from search_spark.operators.linkgraph import hreflang_groups

    rng = _mk_rng()
    langs = ["en", "de", "FR", "es-419"]
    urls = [f"https://x.example/{lang}/p{i}" for i in range(12)
            for lang in ["en", "de", "fr"]]
    decl = set()
    pages = []
    for url in urls:
        tags = []
        for _ in range(rng.randint(0, 2)):
            alt = rng.choice(urls)
            if alt == url:
                continue  # spec self-row is dropped anyway
            lang = rng.choice(langs)
            q = rng.choice(['"', "'"])
            attrs = [
                f"rel={q}alternate{q}",
                f"hreflang={q}{lang}{q}",
                f"href={q}{alt}{q}",
            ]
            rng.shuffle(attrs)
            tags.append(f"<link {' '.join(attrs)}>")
            decl.add((url, alt))
        html = f"<html><head>{''.join(tags)}</head><body>.</body></html>"
        pages.append((url, html.encode()))

    # python CC over the undirected declaration edges
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for a, b in decl:
        union(a, b)
    comps = {}
    for node in parent:
        comps.setdefault(find(node), set()).add(node)
    expected = {}
    for members in comps.values():
        gid = min(members)
        for m in members:
            expected[m] = gid

    df = spark.createDataFrame(pages, schema="url string, html binary")
    got = {r.url: r.group_id for r in hreflang_groups(df).collect()}
    assert got == expected
