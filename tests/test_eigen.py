"""Integer-renormalized eigenvector centrality vs numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.eigen import eigenvector_centrality
from parallel_pagerank_ray.sources.pages import powerlaw_edges


def _canon(e):
    e = np.asarray(e, dtype=np.int64)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    return np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)


def _ds(e):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(e[:, 0], pa.int64()),
                "dst": pa.array(e[:, 1], pa.int64()),
            }
        )
    )


def _np_reference(e, n, iters, scale=1_000_000):
    present = np.zeros(n, bool)
    present[e[:, 0]] = True
    present[e[:, 1]] = True
    x = present.astype(np.int64)
    for _ in range(iters):
        y = np.zeros(n, np.int64)
        np.add.at(y, e[:, 0], x[e[:, 1]])
        np.add.at(y, e[:, 1], x[e[:, 0]])
        ym = int(y.max())
        if ym == 0:
            break
        x = (y * np.int64(scale)) // np.int64(ym)
    return {int(v): int(x[v]) for v in np.flatnonzero(present)}


def test_integer_recurrence_matches_numpy(ray_session):
    for n, m, seed in [(60, 3, 5), (90, 2, 9)]:
        e = _canon(powerlaw_edges(n, m, seed=seed))
        nn = int(e.max()) + 1
        got = eigenvector_centrality(_ds(e), n=nn, iterations=10).to_pandas()
        exp = _np_reference(e, nn, 10)
        assert {int(v): int(s) for v, s in zip(got.vid, got.score)} == exp


def test_approximates_float_eigenvector(ray_session):
    # after enough iterations the integer vector tracks the float
    # dominant eigenvector (scaled to max=1) to ~1e-3
    e = _canon(powerlaw_edges(80, 4, seed=2))
    n = int(e.max()) + 1
    got = eigenvector_centrality(_ds(e), n=n, iterations=40).to_pandas()
    A = np.zeros((n, n))
    A[e[:, 0], e[:, 1]] = 1
    A[e[:, 1], e[:, 0]] = 1
    w, V = np.linalg.eigh(A)
    v = np.abs(V[:, np.argmax(w)])
    v = v / v.max()
    g = np.zeros(n)
    g[got.vid.to_numpy()] = got.score.to_numpy() / 1_000_000.0
    keep = v > 1e-9
    assert np.max(np.abs(g[keep] - v[keep])) < 5e-3


def test_overflow_guard_raises(ray_session):
    import pytest

    e = _canon(powerlaw_edges(30, 3, seed=1))
    with pytest.raises(OverflowError, match="headroom"):
        eigenvector_centrality(
            _ds(e), n=int(e.max()) + 1, iterations=2, scale=1 << 31
        )


def test_dense_state_guard_raises(ray_session):
    import pytest

    e = _canon(powerlaw_edges(30, 3, seed=1))
    with pytest.raises(ValueError, match="broadcast_max"):
        eigenvector_centrality(
            _ds(e), n=int(e.max()) + 1, iterations=2, broadcast_max=3
        )
