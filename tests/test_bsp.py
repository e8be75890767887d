"""BSP actor-engine parity with the NumPy oracle + resume."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp


def _graph(edges: np.ndarray) -> Graph:
    t = pa.table({"src": edges[:, 0], "dst": edges[:, 1]})
    return Graph.from_int_edges(rd.from_arrow(t))


@pytest.mark.parametrize("name", ["small", "medium", "dangling4"])
@pytest.mark.parametrize("tol", [1e-4, 1e-6])
def test_bsp_matches_oracle(graphs, name, tol):
    n, edges = graphs[name]
    g = _graph(edges)
    run = pagerank_bsp(g, d=0.85, tol=tol, num_parts=2)
    tr = oracle.pagerank(n, np.unique(edges, axis=0), d=0.85, tol=tol)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, tr.ranks, atol=1e-6)
    assert run.iterations == tr.iterations
    assert run.exit_reason == tr.exit_reason


def test_bsp_resume_reproduces_uninterrupted(graphs, tmp_path):
    n, edges = graphs["medium"]
    g = _graph(edges)
    full = pagerank_bsp(g, d=0.85, tol=1e-6, num_parts=2)
    ref = full.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()

    wd = str(tmp_path / "ck")
    # partial run: stop after 4 iterations, checkpointing every iter
    part = pagerank_bsp(
        g, d=0.85, tol=1e-6, max_iters=4, num_parts=2,
        workdir=wd, checkpoint_every=1,
    )
    assert part.iterations == 4
    # resume to convergence from the iter=4 checkpoint
    res = pagerank_bsp(
        g, d=0.85, tol=1e-6, num_parts=2, workdir=wd, checkpoint_every=1
    )
    got = res.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert res.iterations == full.iterations
    # bit-identical: float64 round-trips exactly through Parquet
    assert np.array_equal(got, ref)


def test_personalized_pagerank_matches_oracle(graphs):
    n, edges = graphs["medium"]
    rng = np.random.default_rng(13)
    e = rng.random(n)
    e = e / e.sum()
    g = _graph(edges)
    run = pagerank_bsp(g, d=0.85, tol=1e-8, num_parts=2, personalization=e)
    tr = oracle.pagerank(n, np.unique(edges, axis=0), d=0.85, tol=1e-8, e=e)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(got, tr.ranks, atol=1e-6)
    assert run.iterations == tr.iterations
    # restart mass concentrates where e does
    assert got[np.argmax(e)] > got[np.argmin(e)]


def test_uniform_personalization_equals_default(graphs):
    n, edges = graphs["small"]
    g = _graph(edges)
    base = pagerank_bsp(g, d=0.85, tol=1e-6, num_parts=2)
    unif = pagerank_bsp(
        g, d=0.85, tol=1e-6, num_parts=2,
        personalization=np.full(n, 1.0 / n),
    )
    a = base.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = unif.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(a, b, atol=1e-12)
    assert base.iterations == unif.iterations


def test_incremental_pagerank_warm_start(graphs):
    """Warm-starting from a converged run on a slightly-changed graph
    must (a) converge in fewer iterations than cold, (b) match the
    NumPy oracle run from the same init bit-for-bit semantics (1e-12)."""
    import numpy as np

    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    n, e = graphs["medium"]
    base = pagerank_bsp(
        Graph.from_int_edges(edges_dataset(e, num_blocks=2)), tol=1e-10
    )
    ranks0 = (
        base.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    )

    e2 = [tuple(map(int, x)) for x in e] + [(0, n - 1)]  # delta: one new edge
    g2 = Graph.from_int_edges(edges_dataset(e2, num_blocks=2))
    warm = pagerank_bsp(g2, tol=1e-10, init_ranks=ranks0)
    cold = pagerank_bsp(g2, tol=1e-10)
    assert warm.iterations < cold.iterations
    got = warm.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    want = oracle.pagerank(
        n, np.array(sorted(set(e2))), tol=1e-10, init=ranks0
    )
    assert warm.iterations == want.iterations
    assert np.allclose(got, want.ranks, atol=1e-12)


def test_sparse_exchange_parity():
    """A graph touching few destinations must take the sparse (idx,
    val) exchange and still match the oracle bit-for-bit at every
    tolerance."""
    import numpy as np

    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    # n=4000 vertices, edges touch only ~40 destinations -> sparse path
    n = 4000
    e = [(i, (i * 7) % 40) for i in range(0, n, 3)]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    assert g.n == max(x for x, _ in e) + 1
    run = pagerank_bsp(g, tol=1e-8, num_parts=4)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    tr = oracle.pagerank(g.n, np.unique(np.array(e), axis=0), tol=1e-8)
    assert run.iterations == tr.iterations
    assert np.allclose(got, tr.ranks, atol=1e-12)


def test_float32_exchange_parity(graphs):
    """Opt-in float32 wire format: ranks must match the float64 run and
    the oracle within 1e-6 (accumulation stays float64; only per-shard
    partial sums are rounded). Iteration counts match at these
    tolerances on the fixtures."""
    for name, tol in (("small", 1e-6), ("medium", 1e-8), ("dangling4", 1e-6)):
        n, edges = graphs[name]
        g = _graph(edges)
        run = pagerank_bsp(
            g, d=0.85, tol=tol, num_parts=2, exchange_dtype="float32"
        )
        tr = oracle.pagerank(n, np.unique(edges, axis=0), d=0.85, tol=tol)
        got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
        assert np.allclose(got, tr.ranks, atol=1e-6), name
        assert abs(run.iterations - tr.iterations) <= 1, name


def test_incremental_pipeline_api(graphs):
    """Packaged incremental flow: old graph + ranks + delta edges ->
    merged graph + warm-started run with fewer iterations than cold."""
    import numpy as np

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.incremental import incremental_pagerank
    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    base = pagerank_bsp(g, tol=1e-10)
    ranks0 = base.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()

    delta = edges_dataset([(0, n - 1)], num_blocks=1)
    g2, warm = incremental_pagerank(g, ranks0, delta, tol=1e-10)
    assert g2.n == n
    cold = pagerank_bsp(g2, tol=1e-10)
    assert warm.iterations < cold.iterations
    a = warm.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = cold.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.allclose(a, b, atol=1e-9)  # same fixpoint either way
