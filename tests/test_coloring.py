"""Jones-Plassmann coloring vs sequential greedy oracle — exact."""

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.coloring import coloring_bsp
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _colors(run) -> np.ndarray:
    df = run.colors.to_pandas().sort_values("vid")
    return df["color"].to_numpy()


def test_coloring_matches_oracle(graphs):
    for name in ("small", "medium", "dangling4"):
        n, e = graphs[name]
        got = _colors(coloring_bsp(_graph(e)))
        want = oracle.greedy_coloring(n, e)
        assert np.array_equal(got, want), name


def test_coloring_powerlaw_proper_and_parity():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(500, 4, seed=3)
    n = 500
    got = _colors(coloring_bsp(_graph([tuple(r) for r in e])))
    assert np.array_equal(got, oracle.greedy_coloring(n, e))
    # properness: closure endpoints always differ
    de = np.unique(np.asarray(e, dtype=np.int64), axis=0)
    de = de[de[:, 0] != de[:, 1]]
    assert (got[de[:, 0]] != got[de[:, 1]]).all()
    assert (got >= 0).all()


def test_coloring_partition_invariance(graphs):
    n, e = graphs["medium"]
    g = _graph(e)
    a = _colors(coloring_bsp(g, num_parts=1))
    b = _colors(coloring_bsp(g, num_parts=7))
    assert np.array_equal(a, b)


def test_coloring_edgeless():
    g = _graph([(0, 0)], blocks=1)  # closure empty -> all color 0
    got = _colors(coloring_bsp(g))
    assert (got == 0).all()
