"""Lloyd IVF training: parity with a numpy reference implementation,
determinism, and monotone convergence."""

from __future__ import annotations

import numpy as np
import pytest

from search_spark.operators.ivf import train_ivf

SF_DIR = "/root/testdata/sf0.001"


def _numpy_lloyd(X: np.ndarray, k: int, max_iter: int = 20):
    """Plain-numpy oracle with identical conventions: first-k init,
    min-(dist, cell) ties, empty cells keep old centroid."""
    C = X[:k].copy()
    assign = None
    for _ in range(max_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        new_assign = d.argmin(axis=1)  # argmin takes lowest index on ties
        for c in range(k):
            members = X[new_assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        nxt = d2.argmin(axis=1)
        if assign is not None and (nxt == assign).all():
            assign = nxt
            break
        assign = nxt
    return C, assign


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return df


def test_train_ivf_matches_numpy_oracle(spark, emb):
    rows = sorted(
        ((r["vec_id"], r["embedding"]) for r in emb.collect()),
        key=lambda x: x[0],
    )
    X = np.array([[float(v) for v in e] for _, e in rows])
    ids = [i for i, _ in rows]

    centroids, assign, info = train_ivf(emb, n_cells=8)
    C_np, assign_np = _numpy_lloyd(X, 8)

    got_assign = {r["id"]: r["cell"] for r in assign.collect()}
    expected = {ids[i]: int(assign_np[i]) for i in range(len(ids))}
    # partitions must agree (cell labels are aligned by the shared
    # first-k init, so direct comparison is valid)
    assert got_assign == expected

    got_C = {r["cell"]: np.array(r["c_arr"]) for r in centroids.collect()}
    for c in range(8):
        assert np.allclose(got_C[c], C_np[c], atol=1e-9), c


def test_train_ivf_deterministic_and_convergent(spark, emb):
    c1, a1, info1 = train_ivf(emb, n_cells=5)
    c2, a2, info2 = train_ivf(emb, n_cells=5)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert info1["inertia"] == info2["inertia"]
    # inertia is non-increasing across Lloyd iterations
    inert = info1["inertia"]
    assert all(b <= a + 1e-9 for a, b in zip(inert, inert[1:]))
    # converged: last round moved nothing (or hit the iteration cap)
    assert info1["moved"][-1] == 0 or len(info1["moved"]) == 20
    # every vector assigned, cells within range
    n = emb.count()
    assert a1.count() == n
    assert a1.select("cell").distinct().count() <= 5


def test_train_pq_matches_per_subspace_numpy(spark, emb):
    from search_spark.operators.ivf import train_pq

    codebooks, codes, info = train_pq(emb, n_subspaces=4, n_codes=5)
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([list(map(float, r["embedding"])) for r in rows])
    sub_dim = X.shape[1] // 4
    got_cb = {
        (r["subspace"], r["cell"]): np.array(r["c_arr"])
        for r in codebooks.collect()
    }
    got_cd = {
        (r["id"], r["subspace"]): r["cell"] for r in codes.collect()
    }
    for s in range(4):
        Xs = X[:, s * sub_dim:(s + 1) * sub_dim]
        C_np, assign_np = _numpy_lloyd(Xs, 5)
        for c in range(5):
            assert np.allclose(got_cb[(s, c)], C_np[c], atol=1e-9), (s, c)
        for i, vid in enumerate(ids):
            assert got_cd[(vid, s)] == int(assign_np[i]), (vid, s)
    # quantization error is the summed per-subspace inertia, finite and
    # recorded per subspace
    assert set(info) == {0, 1, 2, 3}
    assert all(info[s]["inertia"][-1] >= 0 for s in info)


def test_train_pq_rejects_indivisible_dims(spark, emb):
    from search_spark.operators.ivf import train_pq

    with pytest.raises(ValueError, match="not divisible"):
        train_pq(emb, n_subspaces=7, n_codes=4)
