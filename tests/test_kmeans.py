"""Distributed k-means vs a NumPy mirror — exact assignment parity at
any parallelism (the bit-reproducibility contract the SQL gate relies
on), plus edge rules (empty clusters, ties, iters validation)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines.kmeans import kmeans_assign


def _np_kmeans(X_raw, vid, k, iters, scale=1e6):
    X = np.floor(X_raw.astype(np.float64) * scale)
    Xi = X.astype(np.int64)
    order = np.argsort(vid, kind="stable")
    C = X[order[:k]].copy()
    k = C.shape[0]
    cl = None
    for it in range(iters):
        D = np.zeros((len(X), k))
        for j in range(X.shape[1]):
            d = X[:, j][:, None] - C[None, :, j]
            D += d * d
        cl = np.argmin(D, axis=1)
        if it == iters - 1:
            break
        S = np.zeros((k, X.shape[1]), dtype=np.int64)
        np.add.at(S, cl, Xi)
        cnt = np.bincount(cl, minlength=k)
        nz = cnt > 0
        C[nz] = S[nz].astype(np.float64) / cnt[nz][:, None]
    return cl


def _ds(X, vid, blocks):
    t = pa.table(
        {
            "vec_id": pa.array(vid, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in X], pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _got(ds, **kw):
    df = kmeans_assign(ds, **kw).to_pandas().sort_values("vec_id")
    return df["cluster"].to_numpy()


def test_kmeans_matches_numpy_and_partition_invariant():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(6, 8)) * 3
    X = (centers[rng.integers(0, 6, 200)] + rng.normal(size=(200, 8))).astype(
        np.float32
    )
    vid = np.arange(200, dtype=np.int64)
    want = _np_kmeans(X, vid, k=6, iters=3)
    a = _got(_ds(X, vid, 2), k=6, iters=3)
    b = _got(_ds(X, vid, 7), k=6, iters=3, num_buckets=3)
    assert a.tolist() == want.tolist()
    assert b.tolist() == want.tolist()


def test_kmeans_empty_cluster_keeps_seed():
    # two far groups, k=3 seeded from the first three rows (all in
    # group A) -> at least one seed centroid ends up empty after the
    # first update and must persist unchanged
    X = np.vstack(
        [np.zeros((3, 4)), np.full((5, 4), 100.0)]
    ).astype(np.float32)
    X[1] += 0.25
    X[2] += 0.5
    vid = np.arange(8, dtype=np.int64)
    want = _np_kmeans(X, vid, k=3, iters=3)
    got = _got(_ds(X, vid, 2), k=3, iters=3)
    assert got.tolist() == want.tolist()


def test_semantic_dedup_matches_numpy():
    from parallel_pagerank_ray.pipelines.kmeans import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8)).astype(np.float32)
    # append near-duplicates of the first 10 rows (tiny perturbation ->
    # cosine ~1 inside whatever cluster they land in together)
    dup = (base[:10] * 1.001).astype(np.float32)
    X = np.vstack([base, dup])
    vid = np.arange(len(X), dtype=np.int64)

    cl = _np_kmeans(X, vid, k=5, iters=2)
    keep = np.ones(len(X), dtype=bool)
    Xd = X.astype(np.float64)
    unit = Xd / np.linalg.norm(Xd, axis=1, keepdims=True)
    sims = unit @ unit.T
    for i in range(len(X)):
        for j in range(i):
            if cl[j] == cl[i] and sims[j, i] >= 0.9:
                keep[i] = False
    df = (
        semantic_dedup(_ds(X, vid, 5), k=5, iters=2, threshold=0.9)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert df["cluster"].to_numpy().tolist() == cl.tolist()
    assert df["keep"].to_numpy().tolist() == keep.tolist()
    # the injected near-dups of same-cluster originals must be dropped
    dropped = set(df.loc[~df["keep"], "vec_id"])
    same_cluster_dups = {40 + i for i in range(10) if cl[40 + i] == cl[i]}
    assert same_cluster_dups <= dropped


def test_kmeans_single_iter_and_bad_iters():
    X = np.random.default_rng(1).normal(size=(20, 4)).astype(np.float32)
    vid = np.arange(20, dtype=np.int64)
    want = _np_kmeans(X, vid, k=4, iters=1)
    got = _got(_ds(X, vid, 2), k=4, iters=1)
    assert got.tolist() == want.tolist()
    with pytest.raises(ValueError, match="iters"):
        kmeans_assign(_ds(X, vid, 2), k=4, iters=0)
