"""Integer SimRank vs a dense numpy oracle on small directed graphs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.simrank import SCALE, simrank


def _dense_oracle(n, edges, iters=3, c_num=3, c_den=5):
    indeg = np.zeros(n, dtype=np.int64)
    in_nbrs = [[] for _ in range(n)]
    for s, d in edges:
        in_nbrs[d].append(s)
        indeg[d] += 1
    S = np.eye(n, dtype=np.int64) * SCALE
    for _ in range(iters):
        N = np.zeros((n, n), dtype=np.int64)
        for a in range(n):
            for b in range(n):
                if a == b or indeg[a] == 0 or indeg[b] == 0:
                    continue
                tot = sum(S[i, j] for i in in_nbrs[a] for j in in_nbrs[b])
                N[a, b] = (c_num * tot) // (c_den * indeg[a] * indeg[b])
        S = np.eye(n, dtype=np.int64) * SCALE + N * (
            1 - np.eye(n, dtype=np.int64)
        )
    return S


def _graph(n, edges, parallelism=3):
    df = pd.DataFrame(
        {
            "src": np.array([s for s, _ in edges], dtype=np.int64),
            "dst": np.array([d for _, d in edges], dtype=np.int64),
        }
    )
    return Graph.from_int_edges(
        rd.from_pandas(df).repartition(parallelism), dedup=True
    )


EDGES = [
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 4), (3, 4), (4, 0), (4, 1),
    (5, 0), (5, 1), (2, 5),
]


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_simrank_matches_dense_oracle(iters):
    n = 6
    S = _dense_oracle(n, EDGES, iters=iters)
    got = simrank(_graph(n, EDGES), iters=iters).to_pandas()
    want = {
        (a, b): S[a, b]
        for a in range(n)
        for b in range(n)
        if a != b and S[a, b] > 0
    }
    got_map = {
        (int(r.u), int(r.v)): int(r.simrank) for r in got.itertuples()
    }
    assert got_map == want


def test_simrank_symmetric_and_partition_invariant():
    a = simrank(_graph(6, EDGES, parallelism=1), iters=3).to_pandas()
    b = simrank(_graph(6, EDGES, parallelism=5), iters=3).to_pandas()
    key = lambda df: df.sort_values(["u", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))
    m = {(int(r.u), int(r.v)): int(r.simrank) for r in a.itertuples()}
    for (u, v), s in m.items():
        assert m[(v, u)] == s


def test_simrank_guard_and_empty():
    with pytest.raises(ValueError, match="broadcast_max_edges"):
        simrank(_graph(6, EDGES), broadcast_max_edges=2)
    g = Graph.from_int_edges(
        rd.from_pandas(
            pd.DataFrame(
                {
                    "src": pd.Series([], dtype=np.int64),
                    "dst": pd.Series([], dtype=np.int64),
                }
            )
        )
    )
    assert simrank(g).count() == 0
