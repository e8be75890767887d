"""Batch LCA on the BFS forest vs a sequential pointer-chase oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.lca import tree_lca
from parallel_pagerank_ray.sources.pages import powerlaw_edges


def _canon(e):
    e = np.asarray(e, dtype=np.int64)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    return np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)


def _graph(c):
    return Graph.from_int_edges(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(c[:, 0], pa.int64()),
                    "dst": pa.array(c[:, 1], pa.int64()),
                }
            )
        ),
        dedup=False,
    )


def _forest_oracle(n, canon):
    """Replays the min-parent BFS forest sequentially."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    comp = {}
    for v in sorted(adj):
        if v in comp:
            continue
        comp[v] = v
        stack = [v]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in comp:
                    comp[y] = v
                    stack.append(y)
    depth = {}
    parent = {}
    roots = sorted(set(comp.values()))
    frontier = {r: 0 for r in roots}
    for r in roots:
        depth[r] = 0
    cur = list(roots)
    d = 0
    while cur:
        nxt = []
        for v in cur:
            for w in adj[v]:
                if w not in depth:
                    nxt.append(w)
        nxt = sorted(set(nxt))
        d += 1
        for w in nxt:
            depth[w] = d
            parent[w] = min(
                u for u in adj[w] if depth.get(u, 1 << 60) == d - 1
            )
        cur = nxt
    return parent, depth


def _lca_oracle(parent, depth, a, b):
    if a not in depth or b not in depth:
        return -1, -1
    x, y = a, b
    while depth[x] > depth[y]:
        x = parent[x]
    while depth[y] > depth[x]:
        y = parent[y]
    while x != y:
        if x not in parent or y not in parent:
            return -1, -1
        x, y = parent[x], parent[y]
    return x, depth[a] + depth[b] - 2 * depth[x]


def test_lca_matches_sequential_forest(ray_session):
    canon = _canon(powerlaw_edges(80, 2, seed=3))
    g = _graph(canon)
    parent, depth = _forest_oracle(g.n, canon)
    rng = np.random.default_rng(1)
    a = rng.integers(0, g.n, 60).astype(np.int64)
    b = rng.integers(0, g.n, 60).astype(np.int64)
    q = rd.from_arrow(
        pa.table(
            {
                "qid": pa.array(np.arange(60, dtype=np.int64)),
                "a": pa.array(a),
                "b": pa.array(b),
            }
        )
    )
    got = tree_lca(g, q).to_pandas().sort_values("qid")
    for qa, qb, lc, di in zip(got["a"], got["b"], got["lca"], got["dist"]):
        assert (int(lc), int(di)) == _lca_oracle(
            parent, depth, int(qa), int(qb)
        ), (qa, qb)


def test_lca_forest_guard_raises(ray_session):
    import pytest

    canon = _canon(powerlaw_edges(40, 2, seed=3))
    g = _graph(canon)
    q = rd.from_arrow(
        pa.table(
            {
                "qid": pa.array([0], pa.int64()),
                "a": pa.array([0], pa.int64()),
                "b": pa.array([1], pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError, match="broadcast_max"):
        tree_lca(g, q, broadcast_max=1)
