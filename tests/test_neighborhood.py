"""Neighborhood function (ANF exact / HyperANF) vs NumPy BFS oracle."""

import numpy as np
import pandas as pd
import pytest

from parallel_pagerank_ray.pipelines.neighborhood import (
    HLL_A,
    HLL_B,
    P31,
    neighborhood_function,
)
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _sym(e):
    return np.concatenate([e, e[:, ::-1]], axis=0)


def _exact_pairs(n, e, max_radius):
    """Oracle: |{(v, w): dist(v, w) <= r}| per radius via dense BFS."""
    reach = np.eye(n, dtype=bool)
    adj = np.zeros((n, n), dtype=bool)
    adj[e[:, 0], e[:, 1]] = True
    out = [int(reach.sum())]
    for _ in range(max_radius):
        reach = reach | (reach @ adj)
        out.append(int(reach.sum()))
    return out


def _hll_denoms(n, e, max_radius, m=16):
    """Oracle: replay the register max-merge and exact denominator."""
    vids = np.arange(n, dtype=np.int64)
    h = (vids * HLL_A + HLL_B) % P31
    reg = (h % m).astype(np.int64)
    x = (h // m) | (1 << 27)
    rho = np.log2(x & -x).astype(np.int64) + 1
    regs = np.zeros((n, m), dtype=np.int64)
    regs[vids, reg] = rho

    def denom(r):
        return int((np.int64(1) << (30 - r)).sum())

    out = [denom(regs)]
    for _ in range(max_radius):
        new = regs.copy()
        for s, d in e:
            np.maximum(new[s], regs[d], out=new[s])
        regs = new
        out.append(denom(regs))
    return out


def test_exact_matches_bfs_oracle(graphs):
    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        se = _sym(e)
        got = neighborhood_function(
            edges_dataset(se, num_blocks=3), max_radius=3, mode="exact"
        )
        want = _exact_pairs(n, se, 3)
        assert got["pairs"].tolist() == want, name
        assert got["radius"].tolist() == [0, 1, 2, 3]


def test_exact_directed():
    # 0->1->2 chain: N(0)=3, N(1)=5, N(2)=6 (pairs reachable via out-edges)
    e = np.array([(0, 1), (1, 2)], dtype=np.int64)
    got = neighborhood_function(edges_dataset(e, num_blocks=1), 2, "exact")
    assert got["pairs"].tolist() == [3, 5, 6]


def test_hll_registers_value_exact(graphs):
    n, e = graphs["medium"]
    se = _sym(e)
    got = neighborhood_function(
        edges_dataset(se, num_blocks=2), max_radius=3, mode="hll"
    )
    want = _hll_denoms(n, se, 3)
    assert got["denom_scaled"].tolist() == want
    # estimator is the documented single division of exact operands
    est = (0.673 * 256.0 * 1073741824.0) / np.array(want, dtype=np.float64)
    assert np.array_equal(got["est"].to_numpy(), est)


def test_hll_partition_invariant_and_join_fallback(graphs):
    # a: broadcast fast path; b: forced join fallback (broadcast_max=0)
    # on a different partitioning — identical frames either way
    n, e = graphs["two_comps"]
    se = _sym(e)
    a = neighborhood_function(edges_dataset(se, num_blocks=1), 2, "hll")
    b = neighborhood_function(
        edges_dataset(se, num_blocks=4),
        2,
        "hll",
        num_partitions=3,
        broadcast_max=0,
    )
    pd.testing.assert_frame_equal(a, b)


def test_hll_duplicate_edges_invariant(graphs):
    # max-merge is duplicate-invariant: doubled edge list, same registers
    n, e = graphs["small"]
    se = _sym(e)
    a = neighborhood_function(edges_dataset(se, num_blocks=2), 2, "hll")
    b = neighborhood_function(
        edges_dataset(np.concatenate([se, se]), num_blocks=2), 2, "hll"
    )
    pd.testing.assert_frame_equal(a, b)


def test_validation():
    e = np.array([(0, 1)], dtype=np.int64)
    ds = edges_dataset(e, num_blocks=1)
    with pytest.raises(ValueError, match="unknown mode"):
        neighborhood_function(ds, 1, mode="anf")
    with pytest.raises(ValueError, match="max_radius"):
        neighborhood_function(ds, -1)
    with pytest.raises(ValueError, match="m=16"):
        neighborhood_function(ds, 1, mode="hll", m=8)


def test_effective_diameter_interpolation():
    from parallel_pagerank_ray.pipelines.neighborhood import (
        effective_diameter,
    )

    # curve 10 -> 50 -> 100: 0.9*100 = 90 first reached at r=2;
    # d = 1 + (90-50)/(100-50) = 1.8
    nf = pd.DataFrame({"radius": [0, 1, 2], "pairs": [10, 50, 100]})
    got = effective_diameter(nf, q=0.9)
    assert got["n_pairs_max"].tolist() == [100]
    assert got["d_eff"].tolist() == [1.8]
    # already satisfied at r=0 (edgeless-ish curve)
    flat = pd.DataFrame({"radius": [0, 1], "pairs": [100, 100]})
    assert effective_diameter(flat, q=0.9)["d_eff"].tolist() == [0.0]
    # exact crossing lands on the integer radius
    nf2 = pd.DataFrame({"radius": [0, 1, 2], "pairs": [10, 90, 100]})
    assert effective_diameter(nf2, q=0.9)["d_eff"].tolist() == [1.0]


def test_effective_diameter_rejects_hll_curves():
    from parallel_pagerank_ray.pipelines.neighborhood import (
        effective_diameter,
    )

    hll = pd.DataFrame({"radius": [0, 1], "denom_scaled": [8, 4], "est": [1.0, 2.0]})
    with pytest.raises(ValueError, match="exact-mode curve"):
        effective_diameter(hll)


def test_radius_zero():
    e = np.array([(0, 1), (1, 2)], dtype=np.int64)
    got = neighborhood_function(edges_dataset(e, num_blocks=1), 0, "exact")
    assert got["pairs"].tolist() == [3]
