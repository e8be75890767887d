"""DAG longest-path / path-count DP vs a sequential Kahn oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines.dag import dag_paths
from parallel_pagerank_ray.sources.pages import powerlaw_edges

MOD = (1 << 31) - 1


def _oriented(e):
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


def _kahn_oracle(e):
    n = int(e.max()) + 1
    indeg = np.bincount(e[:, 1], minlength=n)
    present = np.zeros(n, dtype=bool)
    present[e[:, 0]] = True
    present[e[:, 1]] = True
    order = np.argsort(e[:, 0], kind="stable")
    s, d = e[order, 0], e[order, 1]
    starts = np.searchsorted(s, np.arange(n + 1))
    lp = np.zeros(n, dtype=np.int64)
    npv = np.zeros(n, dtype=object)
    frontier = [v for v in np.flatnonzero(present) if indeg[v] == 0]
    for v in frontier:
        npv[v] = 1
    work = indeg.copy()
    out = {}
    while frontier:
        nxt = []
        for v in frontier:
            out[v] = (int(lp[v]), int(npv[v]) % MOD)
            for i in range(starts[v], starts[v + 1]):
                w = d[i]
                lp[w] = max(lp[w], lp[v] + 1)
                npv[w] = (npv[w] or 0) + npv[v]
                work[w] -= 1
                if work[w] == 0:
                    nxt.append(w)
        frontier = nxt
    return out


def _got(e, **kw):
    df = dag_paths(_ds(e), **kw).to_pandas()
    return {
        int(v): (int(l), int(c))
        for v, l, c in zip(df["vid"], df["lp"], df["npaths_mod"])
    }


def test_dag_paths_matches_kahn_oracle(ray_session):
    for n, m, seed in [(60, 2, 3), (80, 3, 7), (50, 5, 1)]:
        e = _oriented(powerlaw_edges(n, m, seed=seed))
        assert _got(e) == _kahn_oracle(e)


def test_dag_paths_diamond_multiplicity(ray_session):
    # 0->1->3, 0->2->3, 0->3: lp(3)=2, npaths(3)=3
    e = np.array([(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)], dtype=np.int64)
    got = _got(e)
    assert got[3] == (2, 3)
    assert got[0] == (0, 1)


def test_dag_paths_ladder_matches_fast_path(ray_session):
    e = _oriented(powerlaw_edges(60, 2, seed=3))
    assert _got(e, broadcast_max=0) == _got(e)


def test_dag_paths_rejects_cycle(ray_session):
    e = np.array([(0, 1), (1, 2), (2, 0)], dtype=np.int64)
    with pytest.raises(ValueError, match="not acyclic"):
        dag_paths(_ds(e)).to_pandas()
    with pytest.raises(ValueError, match="not acyclic"):
        dag_paths(_ds(e), broadcast_max=0).to_pandas()


def _brute_census(e):
    es = {(int(a), int(b)) for a, b in e}
    verts = sorted({v for p in es for v in p})
    cyc = trans = 0
    import itertools

    for a, b, c in itertools.combinations(verts, 3):
        for x, y, z in itertools.permutations((a, b, c)):
            # cyclic orbit counted once per rotation class: fix x = min
            if x == min(x, y, z) and (x, y) in es and (y, z) in es and (z, x) in es:
                cyc += 1
        for x, y, z in itertools.permutations((a, b, c)):
            if (x, y) in es and (y, z) in es and (x, z) in es:
                trans += 1
    return cyc, trans


def test_directed_census_matches_brute(ray_session):
    from parallel_pagerank_ray.pipelines.triangles import (
        directed_triangle_census,
    )

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 25
        e = rng.integers(0, n, size=(160, 2)).astype(np.int64)
        e = np.unique(e[e[:, 0] != e[:, 1]], axis=0)
        exp = _brute_census(e)
        for bme in (50_000_000, 0):
            got = directed_triangle_census(
                _ds(e), n=n, broadcast_max_edges=bme
            ).to_pandas()
            assert (
                int(got["n_cyclic"][0]),
                int(got["n_transitive"][0]),
            ) == exp, (trial, bme)
