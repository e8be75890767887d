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


def _sweep_oracle(n, canon, p, key_scale=1 << 20):
    sym = np.concatenate([canon, canon[:, ::-1]], axis=0)
    deg = np.bincount(sym[:, 0], minlength=n).astype(np.int64)
    sup = [v for v in range(n) if p[v] > 0]
    sup.sort(key=lambda v: (-((int(p[v]) * key_scale) // int(deg[v])), v))
    m2 = 2 * len(canon)
    rows = []
    s: set = set()
    vol = 0
    for k, v in enumerate(sup, start=1):
        s.add(v)
        vol += int(deg[v])
        cut = sum(1 for a, b in canon if (a in s) != (b in s))
        den = min(vol, m2 - vol)
        phi = 1.0 if den == 0 else np.float64(cut) / np.float64(den)
        rows.append((k, v, cut, vol, phi))
    return rows


def test_sweep_cut_matches_brute_force():
    from parallel_pagerank_ray.pipelines.ppr_push import sweep_cut

    e = powerlaw_edges(120, 4, seed=5)
    canon = np.unique(
        np.stack(
            [np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])], 1
        ),
        axis=0,
    )
    canon = canon[canon[:, 0] != canon[:, 1]]
    sym = np.concatenate([canon, canon[:, ::-1]], axis=0)
    g = _graph(sym)
    run = ppr_push(g, seed=int(canon[0, 0]), eps=10**7)
    got = (
        sweep_cut(run.scores, edges_dataset(canon, num_blocks=3))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    p, _r, _it = oracle.ppr_push(120, sym, int(canon[0, 0]), eps=10**7)
    want = _sweep_oracle(120, canon, p)
    assert list(map(tuple, got.to_numpy())) == [
        (float(k), float(v), float(c), float(vo), ph)
        for k, v, c, vo, ph in want
    ]
    # the sweep covers exactly the support
    assert len(got) == int((p > 0).sum())


def test_sweep_cut_isolates_planted_community():
    from parallel_pagerank_ray.pipelines.ppr_push import sweep_cut

    # two 8-cliques joined by a single bridge edge: sweeping from
    # inside one clique must find the clique as the min-phi prefix
    canon = []
    for base in (0, 8):
        canon += [
            (base + i, base + j) for i in range(8) for j in range(i + 1, 8)
        ]
    canon.append((0, 8))
    canon = np.array(sorted(canon), dtype=np.int64)
    sym = np.concatenate([canon, canon[:, ::-1]], axis=0)
    run = ppr_push(_graph(sym), seed=1, eps=10**6)
    got = sweep_cut(run.scores, edges_dataset(canon, num_blocks=2)).to_pandas()
    best = got.loc[got["phi"].idxmin()]
    assert best["k"] == 8
    assert best["cut"] == 1
    assert set(got.sort_values("k").head(8)["vid"]) == set(range(8))


def test_sweep_cut_join_fallback_parity():
    """broadcast_max=0 forces the join path; results must be identical
    to the broadcast fast path on the same input."""
    from parallel_pagerank_ray.pipelines.ppr_push import sweep_cut

    e = powerlaw_edges(150, 4, seed=9)
    canon = np.unique(
        np.stack(
            [np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])], 1
        ),
        axis=0,
    )
    canon = canon[canon[:, 0] != canon[:, 1]]
    sym = np.concatenate([canon, canon[:, ::-1]], axis=0)
    run = ppr_push(_graph(sym), seed=int(canon[0, 0]), eps=10**7)
    fast = (
        sweep_cut(run.scores, edges_dataset(canon, num_blocks=3))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    slow = (
        sweep_cut(
            run.scores, edges_dataset(canon, num_blocks=3), broadcast_max=0
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(map(tuple, fast.to_numpy())) == list(
        map(tuple, slow.to_numpy())
    )
