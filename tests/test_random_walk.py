"""Deterministic random walks vs the pure-int oracle — exact matches,
partition invariance, dead-end termination."""

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.random_walk import random_walks_bsp
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _rows(run):
    df = run.walks.to_pandas()
    return sorted(
        zip(
            df["seed"].tolist(),
            df["widx"].tolist(),
            df["step"].tolist(),
            df["vid"].tolist(),
        )
    )


def test_walks_exact_fixtures(graphs):
    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        g = _graph(e)
        run = random_walks_bsp(g, [0, 1], walks_per_seed=3, length=5, num_parts=3)
        want = sorted(
            oracle.random_walks(n, e, [0, 1], walks_per_seed=3, length=5)
        )
        assert _rows(run) == want, name


def test_walks_directed_dead_end():
    # 0 -> 1 -> 2, 2 has no out-edges: every walk is exactly 3 rows
    e = [(0, 1), (1, 2)]
    g = _graph(e, blocks=1)
    run = random_walks_bsp(g, [0], walks_per_seed=2, length=9, directed=True, num_parts=2)
    rows = _rows(run)
    want = sorted(
        oracle.random_walks(g.n, np.array(e), [0], 2, 9, directed=True)
    )
    assert rows == want
    assert max(r[2] for r in rows) == 2  # walks die at the dead end


def test_walks_partition_invariance():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(200, 3, seed=3)
    g = _graph([tuple(r) for r in e])
    a = _rows(random_walks_bsp(g, [0, 5, 9], walks_per_seed=2, length=6, num_parts=2))
    b = _rows(random_walks_bsp(g, [0, 5, 9], walks_per_seed=2, length=6, num_parts=7))
    assert a == b
    want = sorted(oracle.random_walks(g.n, e, [0, 5, 9], 2, 6))
    assert a == want


def test_walks_salt_changes_corpus():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(150, 4, seed=2)
    g = _graph([tuple(r) for r in e])
    a = _rows(random_walks_bsp(g, [0], walks_per_seed=4, length=6, num_parts=3))
    b = _rows(
        random_walks_bsp(g, [0], walks_per_seed=4, length=6, num_parts=3, salt="other")
    )
    assert a != b
    assert a == sorted(oracle.random_walks(g.n, e, [0], 4, 6))
    assert b == sorted(oracle.random_walks(g.n, e, [0], 4, 6, salt="other"))


def _weighted_ds(e, w, blocks=2):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "src": np.array([a for a, _ in e], dtype=np.int64),
            "dst": np.array([b for _, b in e], dtype=np.int64),
            "w": np.array(w, dtype=np.int64),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_weighted_walks_vs_oracle():
    # symmetric weighted triangle + pendant, skewed weights
    canon = [(0, 1, 1), (0, 2, 10), (1, 2, 3), (2, 3, 5)]
    e = [(a, b) for a, b, _ in canon] + [(b, a) for a, b, _ in canon]
    w = [c for _, _, c in canon] * 2
    g = Graph(n=4, edges=_weighted_ds([(a, b) for a, b in e], w).materialize())
    run = random_walks_bsp(g, [0, 3], walks_per_seed=4, length=6, num_parts=3)
    want = sorted(
        oracle.random_walks_weighted(4, np.array(e), np.array(w), [0, 3], 4, 6)
    )
    assert _rows(run) == want
    # weight bias sanity: from 0, the w=10 edge to 2 dominates the
    # first hops across walks
    first = [r for r in _rows(run) if r[0] == 0 and r[2] == 1]
    assert sum(1 for r in first if r[3] == 2) >= len(first) / 2


def test_weighted_walks_reject_bad_weights():
    import pytest

    e = [(0, 1)]  # zero weight -> invalid
    g = Graph(n=2, edges=_weighted_ds(e, [0], blocks=1).materialize())
    # the ValueError raises in the actor __init__; Ray surfaces it as a
    # RayActorError wrapping the original message
    with pytest.raises(Exception, match="positive integer"):
        random_walks_bsp(g, [0], walks_per_seed=1, length=2, num_parts=2)
