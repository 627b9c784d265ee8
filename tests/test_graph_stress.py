"""Distributed-path stress for pagerank: a graph large enough that every
join/aggregate in the loop does real multi-partition work, checked against
the independent numpy power iteration (same math, driver-side).

Mirrors tests/test_cc_stress.py: local_threshold=0 forces the distributed
formulation that a 10^9-edge graph would take.
"""

import random

import numpy as np
import pytest

from search_spark.operators.graph import pagerank


def _random_digraph(n_nodes=5_000, n_edges=60_000, seed=202):
    rng = random.Random(seed)
    edges = set()
    # guarantee some dangling nodes: the last 5% receive edges but the
    # generator never uses them as sources
    max_src = int(n_nodes * 0.95)
    while len(edges) < n_edges:
        u = rng.randrange(max_src)
        v = rng.randrange(n_nodes)
        if u != v:
            edges.add((f"n{u}", f"n{v}"))
    return sorted(edges)


def _numpy_pagerank(pairs, n_iter, d=0.85):
    names = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    idx = {n: i for i, n in enumerate(names)}
    n = len(names)
    out = np.zeros(n)
    src = np.fromiter((idx[u] for u, _ in pairs), dtype=np.int64)
    dst = np.fromiter((idx[v] for _, v in pairs), dtype=np.int64)
    np.add.at(out, src, 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - d) / n)
        nxt += d * r[out == 0.0].sum() / n
        np.add.at(nxt, dst, d * r[src] / out[src])
        r = nxt
    return {name: r[idx[name]] for name in names}


def test_distributed_pagerank_on_60k_edges(spark):
    pairs = _random_digraph()
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        row["entity"]: row["rank"]
        for row in pagerank(
            df, n_iter=5, local_threshold=0, checkpoint_every=2
        ).collect()
    }
    want = _numpy_pagerank(pairs, n_iter=5)
    assert len(got) == len(want)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    worst = max(abs(got[k] - want[k]) for k in want)
    assert worst < 1e-12
