"""Stress test for connected components against a union-find oracle.

The large-star/small-star loop is the one custom distributed algorithm in
the engine (SURVEY.md §7.2 calls it the hardest non-UDF piece); this test
runs it on randomized graphs — chains, cliques, stars, isolated pairs —
and checks the component partition against a plain python union-find.
"""

from __future__ import annotations

import random

from search_spark.operators.canonicalize import connected_components


def _union_find(edges):
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def _partition(mapping):
    groups: dict[str, frozenset] = {}
    by_comp: dict[str, set] = {}
    for node, comp in mapping.items():
        by_comp.setdefault(comp, set()).add(node)
    for comp, nodes in by_comp.items():
        fs = frozenset(nodes)
        for n in nodes:
            groups[n] = fs
    return set(groups.values())


def test_connected_components_random_graph(spark):
    rng = random.Random(1234)
    edges = []
    # 40 chains of length 2-30
    nid = 0
    for _ in range(40):
        length = rng.randint(2, 30)
        chain = [f"n{nid + i}" for i in range(length)]
        nid += length
        edges += list(zip(chain, chain[1:]))
    # 10 cliques of size 3-8
    for _ in range(10):
        size = rng.randint(3, 8)
        clique = [f"n{nid + i}" for i in range(size)]
        nid += size
        edges += [
            (clique[i], clique[j])
            for i in range(size)
            for j in range(i + 1, size)
        ]
    # 5 stars with 20 leaves (mini head-entity skew)
    for _ in range(5):
        hub = f"n{nid}"
        nid += 1
        for _ in range(20):
            leaf = f"n{nid}"
            nid += 1
            edges.append((hub, leaf))
    # some random extra merges across structures
    all_nodes = [f"n{i}" for i in range(nid)]
    for _ in range(25):
        edges.append((rng.choice(all_nodes), rng.choice(all_nodes)))
    edges = [(a, b) for a, b in edges if a != b]
    rng.shuffle(edges)

    df = spark.createDataFrame(edges, ["src", "dst"])
    want = _union_find(edges)

    # both execution paths must produce the identical partition AND
    # representative: the distributed large-star/small-star loop
    # (local_threshold=0 forces it) and the small-graph driver fallback
    for threshold in (0, 10**9):
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                df, local_threshold=threshold
            ).collect()
        }
        assert set(got) == set(want), "node sets differ"
        assert _partition(got) == _partition(want), (
            "component partitions differ"
        )
        # representative must be the lexicographic minimum of its component
        for comp_nodes in _partition(got):
            rep = min(comp_nodes)
            assert all(got[n] == rep for n in comp_nodes)
