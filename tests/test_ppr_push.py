"""ACL push BSP vs the sequential synchronous-round NumPy oracle."""

import numpy as np
import pytest

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.ppr_push import ppr_push
from parallel_pagerank_ray.sources.edge_list import edges_dataset
from parallel_pagerank_ray.sources.pages import powerlaw_edges


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(np.asarray(e, np.int64), blocks))


def _check(n, e, seed, **kw):
    g = _graph(e)
    run = ppr_push(g, seed=seed, **kw)
    got = run.scores.to_pandas().sort_values("vid")
    p, r, rounds = oracle.ppr_push(n, np.unique(np.asarray(e), axis=0), seed, **kw)
    keep = np.nonzero((p > 0) | (r > 0))[0]
    assert got["vid"].tolist() == keep.tolist()
    assert got["p"].tolist() == p[keep].tolist()
    assert got["r"].tolist() == r[keep].tolist()
    assert run.iterations == rounds
    # all mass conserved: integer splits never create or drop units
    assert int(got["p"].sum() + got["r"].sum()) == kw.get("scale", 10**12)


def test_matches_oracle_reference_graphs(graphs):
    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        sym = np.concatenate([e, e[:, ::-1]], axis=0)
        _check(n, sym, seed=0, eps=10**8)


def test_matches_oracle_powerlaw():
    e = powerlaw_edges(300, 5, seed=3)
    sym = np.unique(np.concatenate([e, e[:, ::-1]], axis=0), axis=0)
    _check(300, sym, seed=int(sym[0, 0]), eps=10**7)


def test_locality():
    # two disjoint rings: mass never reaches the other component
    e = [(i, (i + 1) % 6) for i in range(6)] + [
        (6 + i, 6 + (i + 1) % 6) for i in range(6)
    ]
    sym = np.concatenate([np.array(e), np.array(e)[:, ::-1]], axis=0)
    g = _graph(sym)
    run = ppr_push(g, seed=0, eps=10**6)
    got = run.scores.to_pandas()
    assert got["vid"].max() < 6


def test_partition_invariance():
    e = powerlaw_edges(200, 4, seed=9)
    sym = np.unique(np.concatenate([e, e[:, ::-1]], axis=0), axis=0)
    a = ppr_push(_graph(sym, blocks=1), seed=0, eps=10**7, num_parts=2)
    b = ppr_push(_graph(sym, blocks=4), seed=0, eps=10**7, num_parts=7)
    pa_ = a.scores.to_pandas().sort_values("vid").reset_index(drop=True)
    pb = b.scores.to_pandas().sort_values("vid").reset_index(drop=True)
    assert pa_.equals(pb)


def test_round_cap_and_validation(graphs):
    n, e = graphs["medium"]
    sym = np.concatenate([e, e[:, ::-1]], axis=0)
    g = _graph(sym)
    run = ppr_push(g, seed=0, eps=10**6, max_rounds=2)
    p, r, rounds = oracle.ppr_push(
        n, np.unique(sym, axis=0), 0, eps=10**6, max_rounds=2
    )
    assert run.iterations == rounds == 2
    got = run.scores.to_pandas().sort_values("vid")
    keep = np.nonzero((p > 0) | (r > 0))[0]
    assert got["p"].tolist() == p[keep].tolist()
    with pytest.raises(ValueError, match="seed"):
        ppr_push(g, seed=-1)
    with pytest.raises(ValueError, match="eps"):
        ppr_push(g, seed=0, eps=5, alpha_den=20)
    with pytest.raises(ValueError, match="alpha"):
        ppr_push(g, seed=0, alpha_num=25, alpha_den=20)
