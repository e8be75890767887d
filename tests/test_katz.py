"""Katz centrality (integer-scaled truncated) vs NumPy oracle — exact."""

import numpy as np
import pytest

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.katz import katz_bsp, katz_dataset
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def test_katz_both_engines_vs_oracle(graphs):
    for name in ("small", "medium", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        want = oracle.katz_scores(n, e, length=4)
        for fn in (katz_bsp, katz_dataset):
            run = fn(g, length=4)
            df = run.scores.to_pandas().sort_values("vid")
            assert np.array_equal(df["score"].to_numpy(), want), (
                name,
                fn.__name__,
            )


def test_katz_powerlaw_engine_parity():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(400, 4, seed=7)
    g = _graph([tuple(r) for r in e])
    # walk counts are duplicate-sensitive; the engine dedups edges
    want = oracle.katz_scores(g.n, np.unique(e, axis=0), length=3)
    for fn in (katz_bsp, katz_dataset):
        run = fn(g, length=3)
        df = run.scores.to_pandas().sort_values("vid")
        assert np.array_equal(df["score"].to_numpy(), want), fn.__name__


def test_katz_length_one_is_weighted_indegree(graphs):
    n, e = graphs["medium"]
    g = _graph(e)
    run = katz_bsp(g, length=1)
    df = run.scores.to_pandas().sort_values("vid")
    de = np.unique(e, axis=0)
    indeg = np.bincount(de[:, 1], minlength=n)
    assert np.array_equal(df["score"].to_numpy(), indeg)


def test_katz_overflow_guard():
    e = [(i, j) for i in range(20) for j in range(20) if i != j]
    g = _graph(e, blocks=1)
    with pytest.raises(OverflowError):
        katz_bsp(g, length=15)


def test_katz_validates_length(graphs):
    n, e = graphs["small"]
    g = _graph(e)
    with pytest.raises(ValueError):
        katz_bsp(g, length=0)
    with pytest.raises(ValueError):
        katz_dataset(g, length=0)
