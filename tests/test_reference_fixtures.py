"""Parity on the REFERENCE's own fixture files: parse its edge-list
format and reproduce PageRank/CC/triangles with the reference's
arithmetic (SURVEY.md §5.3 — the fixtures are the reference's only
committed test inputs). Also a medium-random-graph exactness check for
CC/LPA beyond the tiny fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.components import connected_components
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.label_prop import label_propagation
from parallel_pagerank_ray.pipelines.pagerank import pagerank
from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
from parallel_pagerank_ray.sources.edge_list import edges_dataset, read_edge_list
from parallel_pagerank_ray.sources.pages import random_graph

REF_FILES = [
    "/root/reference/pagerank_mpi/small_graph.txt",
    "/root/reference/sample_graphs/medium_graph.txt",
    "/root/reference/sample_graphs/large_graph.txt",
]


@pytest.mark.parametrize("path", REF_FILES)
def test_reference_fixture_pagerank_parity(path):
    edges_ds = read_edge_list(path).materialize()
    e = edges_ds.to_pandas().to_numpy()
    g = Graph.from_int_edges(edges_ds)
    for tol in (1e-4, 1e-6):
        run = pagerank_bsp(g, d=0.85, tol=tol, num_parts=2)
        tr = oracle.pagerank(g.n, np.unique(e, axis=0), d=0.85, tol=tol)
        got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
        assert np.allclose(got, tr.ranks, atol=1e-6), (path, tol)
        assert run.iterations == tr.iterations, (path, tol)
        assert run.exit_reason == tr.exit_reason, (path, tol)


def test_reference_fixture_components_triangles():
    from parallel_pagerank_ray.pipelines.triangles import triangle_count

    for path in REF_FILES:
        edges_ds = read_edge_list(path).materialize()
        e = edges_ds.to_pandas().to_numpy()
        g = Graph.from_int_edges(edges_ds)
        comp = (
            connected_components(g, num_parts=2)
            .components.to_pandas()
            .sort_values("vid")["comp"]
            .to_numpy()
        )
        assert np.array_equal(comp, oracle.connected_components(g.n, e)), path
        assert triangle_count(g) == oracle.triangle_count(g.n, e), path


def test_random_graph_cc_lpa_exact():
    n = 400
    e = random_graph(n, p=0.008, seed=9)  # sparse, several components
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=4))
    comp = (
        connected_components(g, num_parts=4)
        .components.to_pandas()
        .sort_values("vid")["comp"]
        .to_numpy()
    )
    assert np.array_equal(comp, oracle.connected_components(n, e))

    run = label_propagation(g, max_iters=5, num_parts=4)
    got = run.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    want, rounds = oracle.label_propagation(n, e, max_iters=5)
    assert np.array_equal(got, want)
    assert run.iterations == rounds
