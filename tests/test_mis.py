"""Luby MIS vs NumPy oracle — exact set equality + MIS laws."""

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.mis import mis_bsp
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _members(run) -> np.ndarray:
    df = run.members.to_pandas()
    return np.sort(df["vid"].to_numpy()) if len(df) else np.array([], dtype=np.int64)


def test_mis_matches_oracle(graphs):
    for name in ("small", "medium", "dangling4"):
        n, e = graphs[name]
        got = _members(mis_bsp(_graph(e)))
        want = np.nonzero(oracle.luby_mis(n, e))[0]
        assert np.array_equal(got, want), name


def test_mis_powerlaw_laws_and_parity():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(500, 4, seed=11)
    n = 500
    g = _graph([tuple(r) for r in e])
    got = _members(mis_bsp(g))
    want = np.nonzero(oracle.luby_mis(n, e))[0]
    assert np.array_equal(got, want)
    # independence: no closure edge inside the set
    member = np.zeros(n, dtype=bool)
    member[got] = True
    de = np.unique(np.asarray(e, dtype=np.int64), axis=0)
    de = de[de[:, 0] != de[:, 1]]
    assert not (member[de[:, 0]] & member[de[:, 1]]).any()
    # maximality: every non-member has a member neighbor
    covered = member.copy()
    covered[de[:, 0][member[de[:, 1]]]] = True
    covered[de[:, 1][member[de[:, 0]]]] = True
    assert covered.all()


def test_mis_partition_invariance(graphs):
    n, e = graphs["medium"]
    g = _graph(e)
    a = _members(mis_bsp(g, num_parts=1))
    b = _members(mis_bsp(g, num_parts=7))
    assert np.array_equal(a, b)


def test_mis_isolated_and_empty():
    # edgeless graph: every vertex is in the MIS
    g = _graph([(0, 0)], blocks=1)  # self loop only -> closure empty
    got = _members(mis_bsp(g))
    assert np.array_equal(got, np.arange(g.n))
