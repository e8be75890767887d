"""k-truss peeling vs a brute-force oracle (pipelines/ktruss.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.ktruss import ktruss_edges


def _brute(n, edges, k):
    E = set(map(tuple, (sorted(e) for e in edges if e[0] != e[1])))
    changed = True
    while changed and E:
        adj = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        dead = {e for e in E if len(adj[e[0]] & adj[e[1]]) < k - 2}
        changed = bool(dead)
        E -= dead
    return sorted(E)


def _edges_of(ds):
    if ds.count() == 0:
        return []
    df = ds.to_pandas().sort_values(["src", "dst"])
    return list(map(tuple, df[["src", "dst"]].to_numpy()))


def test_ktruss_known_shape():
    # K4 plus a pendant triangle: 4-truss = the K4 only
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    extra = [(3, 4), (3, 5), (4, 5)]
    g = Graph(
        n=6,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": np.array([e[0] for e in k4 + extra], dtype=np.int64),
                    "dst": np.array([e[1] for e in k4 + extra], dtype=np.int64),
                }
            )
        ).materialize(),
    )
    assert _edges_of(ktruss_edges(g, 3)) == sorted(k4 + extra)
    assert _edges_of(ktruss_edges(g, 4)) == sorted(k4)
    assert _edges_of(ktruss_edges(g, 5)) == []


def test_ktruss_random_matches_bruteforce():
    rng = np.random.default_rng(5)
    for trial in range(3):
        n = int(rng.integers(6, 40))
        m = int(rng.integers(5, 4 * n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        g = Graph(
            n=n,
            edges=rd.from_arrow(
                pa.table({"src": e[:, 0], "dst": e[:, 1]})
            ).materialize(),
        )
        for k in (3, 4):
            assert _edges_of(ktruss_edges(g, k)) == _brute(n, e.tolist(), k), (
                trial,
                k,
            )


def test_ktruss_cascade():
    # triangle chain where removing one edge's support cascades:
    # two triangles sharing an edge; k=4 kills everything (no edge has
    # 2 triangles after the outer edges die)
    e = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    g = Graph(
        n=4,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": np.array([x[0] for x in e], dtype=np.int64),
                    "dst": np.array([x[1] for x in e], dtype=np.int64),
                }
            )
        ).materialize(),
    )
    assert _edges_of(ktruss_edges(g, 4)) == []
    assert ktruss_edges(g, 3).count() == 5


def test_ktruss_rejects_k2():
    g = Graph(n=2, edges=rd.from_items([{"src": 0, "dst": 1}]))
    import pytest

    with pytest.raises(ValueError):
        ktruss_edges(g, 2)
