"""Boruvka minimum spanning forest vs a Kruskal union-find oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.msf import msf_boruvka


def _kruskal(n: int, src, dst, w) -> list[tuple[int, int, int]]:
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    edges = sorted(set(zip(w[keep].tolist(), lo[keep].tolist(), hi[keep].tolist())))
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for ww, l, h in edges:
        a, b = find(l), find(h)
        if a != b:
            parent[a] = b
            out.append((l, h, ww))
    return sorted(out)


def _graph(seed: int, n: int, m: int, wmax: int):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, wmax, m)
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )
    return Graph(n=n, edges=rd.from_arrow(t)), src, dst, w


@pytest.mark.parametrize("seed,n,m,wmax", [(3, 120, 500, 50), (9, 60, 90, 4)])
def test_msf_matches_kruskal(seed, n, m, wmax):
    g, src, dst, w = _graph(seed, n, m, wmax)
    run = msf_boruvka(g)
    got = run.edges.to_pandas()
    gotl = sorted(zip(got["src"], got["dst"], got["w"]))
    assert gotl == _kruskal(n, src, dst, w)
    # forest edge count = vertices-in-edges - components
    assert run.rounds >= 1


def test_msf_join_fallback_identical():
    g, src, dst, w = _graph(7, 50, 160, 10)
    fast = msf_boruvka(g).edges.to_pandas()
    g2, *_ = _graph(7, 50, 160, 10)
    slow = msf_boruvka(g2, broadcast_max=1).edges.to_pandas()
    a = sorted(zip(fast["src"], fast["dst"], fast["w"]))
    b = sorted(zip(slow["src"], slow["dst"], slow["w"]))
    assert a == b == _kruskal(50, src, dst, w)


def test_msf_disconnected_and_duplicate_edges():
    # two cliques, duplicate + self-loop edges; heavy duplicate rows
    src = np.array([0, 1, 0, 0, 5, 6, 5, 3, 3])
    dst = np.array([1, 2, 2, 0, 6, 7, 7, 3, 4])
    w = np.array([2, 3, 4, 9, 1, 1, 5, 9, 2])
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )
    run = msf_boruvka(Graph(n=8, edges=rd.from_arrow(t)))
    got = sorted(
        zip(
            run.edges.to_pandas()["src"],
            run.edges.to_pandas()["dst"],
            run.edges.to_pandas()["w"],
        )
    )
    assert got == _kruskal(8, src, dst, w)
    # (3,4) bridges its own 2-vertex component; self-loop (3,3) excluded
    assert (3, 4, 2) in got
