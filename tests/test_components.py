"""CC / LPA / triangles vs oracles — exact matches (SURVEY.md §5c)."""

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.components import connected_components
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.label_prop import label_propagation
from parallel_pagerank_ray.pipelines.triangles import triangle_count
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def test_components_exact(graphs):
    for name in ("small", "two_comps", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        run = connected_components(g, num_parts=2)
        got = run.components.to_pandas().sort_values("vid")["comp"].to_numpy()
        want = oracle.connected_components(n, e)
        assert np.array_equal(got, want), name


def test_components_isolated_vertex():
    # id gap -> isolated vertex is its own component (reference N semantics)
    g = _graph([(0, 1), (3, 4)], blocks=1)
    run = connected_components(g, num_parts=2)
    got = run.components.to_pandas().sort_values("vid")["comp"].tolist()
    assert got == [0, 0, 2, 3, 3]


def test_label_propagation_exact(graphs):
    for name in ("small", "two_comps", "medium"):
        n, e = graphs[name]
        g = _graph(e)
        run = label_propagation(g, max_iters=10, num_parts=2)
        got = run.labels.to_pandas().sort_values("vid")["label"].to_numpy()
        want, rounds = oracle.label_propagation(n, e, max_iters=10)
        assert np.array_equal(got, want), name
        assert run.iterations == rounds, name


def test_triangles_exact(graphs):
    for name, expected in (("small", 4), ("medium", 7), ("two_comps", 0)):
        n, e = graphs[name]
        g = _graph(e)
        assert triangle_count(g) == expected == oracle.triangle_count(n, e), name
