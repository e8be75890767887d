"""Dataset-engine checkpoint resume, extreme hub skew, and
parallelism-invariance of LPA (SURVEY.md §5d/f, §4 skew row)."""

from __future__ import annotations

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.label_prop import label_propagation
from parallel_pagerank_ray.pipelines.pagerank import pagerank
from parallel_pagerank_ray.pipelines.triangles import triangle_count
from parallel_pagerank_ray.sources.edge_list import edges_dataset
from parallel_pagerank_ray.sources.pages import complete_graph, star_graph


def test_dataset_engine_resume(graphs, tmp_path):
    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    full = pagerank(g, tol=1e-6, num_parts=2)
    ref = full.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()

    wd = str(tmp_path / "ck")
    part = pagerank(g, tol=1e-6, max_iters=4, num_parts=2, workdir=wd)
    assert part.iterations == 4
    res = pagerank(g, tol=1e-6, num_parts=2, workdir=wd)
    got = res.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert res.iterations == full.iterations
    assert np.array_equal(got, ref)  # float64 parquet round-trip is exact


def test_star_hub_skew():
    """Star graph: one hub touches every vertex — worst-case gather skew.
    Chunked scatter + map-side combine must still match the oracle."""
    n = 201
    e = star_graph(n)
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=4))
    run = pagerank(g, tol=1e-6, num_parts=4)
    tr = oracle.pagerank(n, np.unique(e, axis=0), tol=1e-6)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, tr.ranks, atol=1e-6)
    assert run.iterations == tr.iterations


def test_complete_graph_triangles():
    n = 12
    e = complete_graph(n)
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    assert triangle_count(g) == n * (n - 1) * (n - 2) // 6


def test_lpa_parallelism_invariance(graphs):
    n, e = graphs["medium"]
    runs = []
    for parts in (1, 4):
        g = Graph.from_int_edges(edges_dataset(e, num_blocks=parts))
        r = label_propagation(g, max_iters=10, num_parts=parts)
        runs.append(r.labels.to_pandas().sort_values("vid")["label"].to_numpy())
    assert np.array_equal(runs[0], runs[1])
