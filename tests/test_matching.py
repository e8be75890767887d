"""Handshake maximal matching vs oracle — exact set + matching laws."""

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.matching import matching_bsp
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _pairs(run) -> np.ndarray:
    df = run.pairs.to_pandas()
    if len(df) == 0:  # Ray 2.49: to_pandas of an all-empty ds drops cols
        return np.empty((0, 2), dtype=np.int64)
    df = df.sort_values(["src", "dst"])
    return df[["src", "dst"]].to_numpy().reshape(-1, 2)


def test_matching_matches_oracle(graphs):
    for name in ("small", "medium", "dangling4"):
        n, e = graphs[name]
        got = _pairs(matching_bsp(_graph(e)))
        want = oracle.handshake_matching(n, e)
        assert np.array_equal(got, want), name


def test_matching_powerlaw_laws_and_parity():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(500, 4, seed=13)
    n = 500
    got = _pairs(matching_bsp(_graph([tuple(r) for r in e])))
    assert np.array_equal(got, oracle.handshake_matching(n, e))
    # it IS a matching: every vertex appears at most once
    flat = got.reshape(-1)
    assert len(np.unique(flat)) == len(flat)
    # maximality: every alive closure edge has a matched endpoint
    de = np.unique(np.asarray(e, dtype=np.int64), axis=0)
    de = de[de[:, 0] != de[:, 1]]
    matched = np.zeros(n, dtype=bool)
    matched[flat] = True
    assert (matched[de[:, 0]] | matched[de[:, 1]]).all()


def test_matching_partition_invariance(graphs):
    n, e = graphs["medium"]
    g = _graph(e)
    a = _pairs(matching_bsp(g, num_parts=1))
    b = _pairs(matching_bsp(g, num_parts=7))
    assert np.array_equal(a, b)


def test_matching_edgeless():
    g = _graph([(0, 0)], blocks=1)
    got = _pairs(matching_bsp(g))
    assert len(got) == 0
