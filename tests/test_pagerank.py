"""Distributed PageRank vs the NumPy oracle (allclose 1e-6, identical
iteration counts + exit paths — SURVEY.md §5c/d)."""

import numpy as np
import ray.data as rd

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.pagerank import pagerank
from parallel_pagerank_ray.sources.edge_list import edges_dataset

from tests.test_graph_build import vid_map


def _check(graph: Graph, n: int, edges: np.ndarray, tol: float, perm=None):
    run = pagerank(graph, tol=tol, num_parts=2)
    tr = oracle.pagerank(n, edges, tol=tol)
    assert run.iterations == tr.iterations
    assert run.exit_reason == tr.exit_reason
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    want = tr.ranks if perm is None else tr.ranks[perm]
    assert np.allclose(got, want, atol=1e-6)


def test_small_both_tolerances(graphs):
    n, e = graphs["small"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=3))
    _check(g, n, e, 1e-4)  # l1 exit path
    _check(g, n, e, 1e-6)  # max_err exit path


def test_medium_dual_criterion(graphs):
    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    _check(g, n, e, 1e-4)  # exits via max_err with L1 still above tol


def test_dangling_mass_redistribution(graphs):
    n, e = graphs["dangling4"]
    g = Graph.from_int_edges(edges_dataset(e))
    run = pagerank(g, tol=1e-6, num_parts=2)
    tr = oracle.pagerank(n, e, tol=1e-6)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, tr.ranks, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_from_pages_end_to_end(pages_dir, graphs):
    # full pipeline: pages -> extract -> vids -> edges -> pagerank;
    # compare through the url<->vid bijection
    name = "small"
    n, e = graphs[name]
    g = Graph.from_pages(rd.read_parquet(str(pages_dir / f"{name}.parquet")))
    m = vid_map(g, name, n)
    perm = np.empty(n, dtype=np.int64)
    for ref_vid, eng_vid in m.items():
        perm[eng_vid] = ref_vid
    run = pagerank(g, tol=1e-6, num_parts=2)
    tr = oracle.pagerank(n, e, tol=1e-6)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert run.iterations == tr.iterations
    assert np.allclose(got, tr.ranks[perm], atol=1e-6)


def test_parallelism_invariance(graphs):
    # same results when the edge table arrives in 1 block vs 4 blocks
    n, e = graphs["medium"]
    runs = []
    for blocks, parts in ((1, 1), (4, 3)):
        g = Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))
        run = pagerank(g, tol=1e-6, num_parts=parts)
        runs.append(run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy())
        assert run.iterations == 17
    assert np.allclose(runs[0], runs[1], atol=1e-9)


def test_self_loop_kept(graphs):
    # reference parses a self-loop like any edge (csr_graph.c:49-57)
    n, e = graphs["small"]
    e2 = np.vstack([e, [[1, 1]]])
    g = Graph.from_int_edges(edges_dataset(e2))
    run = pagerank(g, tol=1e-6, num_parts=2)
    tr = oracle.pagerank(n, e2, tol=1e-6)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert run.iterations == tr.iterations
    assert np.allclose(got, tr.ranks, atol=1e-6)
