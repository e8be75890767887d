"""node2vec second-order walks vs a sequential NumPy replay."""

import numpy as np
import pytest

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.node2vec import (
    node2vec_hash,
    node2vec_walks_bsp,
)
from parallel_pagerank_ray.pipelines.random_walk import salt64
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _brute(n, e, seeds, walks_per_seed, length, wr, wi, wf, salt="n2v"):
    adj = [set() for _ in range(n)]
    for a, b in e:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nbrs = [sorted(s) for s in adj]
    s64 = salt64(salt)
    rows = set()
    for s in seeds:
        for w in range(walks_per_seed):
            v, prev = s, s
            rows.add((s, w, 0, v))
            for step in range(length):
                cand = nbrs[v]
                if not cand:
                    break
                bw = [
                    wr if x == prev else (wi if x in adj[prev] else wf)
                    for x in cand
                ]
                tot = sum(bw)
                h = int(
                    node2vec_hash(
                        s64,
                        np.array([s], dtype=np.int64),
                        np.array([w], dtype=np.int64),
                        step + 1,
                        np.array([v], dtype=np.int64),
                        np.array([prev], dtype=np.int64),
                    )[0]
                )
                r = h % tot
                cum = 0
                for x, b in zip(cand, bw):
                    cum += b
                    if r < cum:
                        nxt = x
                        break
                prev, v = v, nxt
                rows.add((s, w, step + 1, v))
    return rows


def _rows(run):
    df = run.walks.to_pandas()
    return set(
        zip(
            df["seed"].tolist(),
            df["widx"].tolist(),
            df["step"].tolist(),
            df["vid"].tolist(),
        )
    )


def test_node2vec_matches_replay_all_partitionings():
    rng = np.random.default_rng(7)
    n, m = 50, 220
    e = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    ]
    want = _brute(n, e, [0, 3, 9], 4, 6, wr=1, wi=4, wf=2)
    for parts in (1, 3, 8):
        run = node2vec_walks_bsp(
            _graph(e, blocks=3), [0, 3, 9], walks_per_seed=4, length=6,
            num_parts=parts,
        )
        assert _rows(run) == want, parts


def test_node2vec_bias_extremes():
    # triangle 0-1-2 plus a pendant 3 off vertex 1: from 1 (arrived
    # from 0) the candidates are {0 (return), 2 (in N(0)), 3 (far)}
    e = [(0, 1), (1, 2), (0, 2), (1, 3)]
    n = 4
    # huge w_far forces distance-2 exploration: the step from 1 with
    # prev 0 must go to 3 whenever the walk reaches that state
    want = _brute(n, e, [0], 6, 4, wr=1, wi=1, wf=10**6)
    run = node2vec_walks_bsp(
        _graph(e), [0], walks_per_seed=6, length=4,
        w_return=1, w_inout=1, w_far=10**6, num_parts=2,
    )
    got = _rows(run)
    assert got == want
    # and the bias is visible: some walk visits the pendant
    assert any(vid == 3 for (_, _, _, vid) in got)


def test_node2vec_uniform_weights_reduce_to_slot_pick():
    # w_return = w_inout = w_far -> the second-order bias vanishes
    e = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9)]
    want = _brute(12, e, [0, 6], 3, 5, wr=2, wi=2, wf=2)
    run = node2vec_walks_bsp(
        _graph(e), [0, 6], walks_per_seed=3, length=5,
        w_return=2, w_inout=2, w_far=2, num_parts=3,
    )
    assert _rows(run) == want


def test_node2vec_validation_and_edges():
    e = [(0, 1)]
    with pytest.raises(ValueError, match="bias weights"):
        node2vec_walks_bsp(_graph(e), [0], w_return=0)
    with pytest.raises(ValueError, match="out of range"):
        node2vec_walks_bsp(_graph(e), [7])
    # isolated seed: the walk records step 0 and ends
    g = Graph.from_int_edges(edges_dataset([(0, 1), (3, 3)], num_blocks=1))
    run = node2vec_walks_bsp(g, [3], walks_per_seed=2, length=5, num_parts=2)
    assert _rows(run) == {(3, 0, 0, 3), (3, 1, 0, 3)}
