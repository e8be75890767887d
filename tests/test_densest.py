"""Densest subgraph (Bahmani (1+eps) peel) vs a NumPy round replay."""

import numpy as np
import pytest

from parallel_pagerank_ray.pipelines.densest import densest_subgraph_bsp
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _members(run):
    df = run.members.to_pandas()
    return sorted(df["vid"].tolist()) if len(df) else []


def _brute(n, e, eps_num=5, eps_den=4):
    """Replay the exact engine rule on dense numpy state."""
    und = set()
    for a, b in e:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = [set() for _ in range(n)]
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    alive = np.ones(n, dtype=bool)
    deg = np.array([len(adj[v]) for v in range(n)], dtype=np.int64)
    best = None  # (S, N, round, members)
    rnd = 0
    while alive.any():
        rnd += 1
        N = int(alive.sum())
        S = int(deg[alive].sum())
        if best is None or S * best[1] > best[0] * N:
            best = (S, N, rnd, sorted(np.nonzero(alive)[0].tolist()))
        thr = (eps_num * S) // (eps_den * N)
        doomed = np.nonzero(alive & (deg <= thr))[0]
        alive[doomed] = False
        for v in doomed:
            for u in adj[v]:
                deg[u] -= 1
    return best


def test_densest_planted_clique():
    # sparse ring + a planted 8-clique: the clique is the densest set
    rng = np.random.default_rng(5)
    n = 60
    e = [(i, (i + 1) % n) for i in range(n)]
    clique = list(range(20, 28))
    e += [(a, b) for a in clique for b in clique if a < b]
    S, N, rnd, members = _brute(n, e)
    assert members == clique  # the replayed rule does isolate it
    run = densest_subgraph_bsp(_graph(e), num_parts=3)
    assert _members(run) == clique
    assert (run.degree_sum, run.n_members, run.best_round) == (S, N, rnd)


def test_densest_random_all_partitionings():
    rng = np.random.default_rng(17)
    n, m = 80, 400
    e = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    ]
    S, N, rnd, members = _brute(n, e)
    for parts in (1, 3, 8):
        run = densest_subgraph_bsp(_graph(e, blocks=3), num_parts=parts)
        assert _members(run) == members, parts
        assert (run.degree_sum, run.n_members, run.best_round) == (S, N, rnd)


def test_densest_eps_parameter_and_edge_cases():
    # edgeless graph: round 1 has density 0 with everyone alive ->
    # everyone is the (degenerate) densest set
    g = Graph.from_int_edges(edges_dataset([(0, 0), (3, 3)], num_blocks=1))
    run = densest_subgraph_bsp(g, num_parts=2)
    assert _members(run) == [0, 1, 2, 3]
    assert run.degree_sum == 0 and run.best_round == 1

    # a coarser eps peels more per round but the rule stays replayable
    e = [(i, j) for i in range(7) for j in range(7) if i < j]
    e += [(7 + i, 7 + ((i + 1) % 9)) for i in range(9)]
    S, N, rnd, members = _brute(16, e, eps_num=3, eps_den=2)
    run = densest_subgraph_bsp(_graph(e), eps_num=3, eps_den=2, num_parts=2)
    assert _members(run) == members == list(range(7))
    assert (run.degree_sum, run.n_members, run.best_round) == (S, N, rnd)

    with pytest.raises(ValueError, match="eps_num"):
        densest_subgraph_bsp(_graph(e), eps_num=1, eps_den=1)


def test_densest_approximation_bound():
    # Bahmani guarantee: density(found) >= max density / (2 (1+eps)).
    # Check against the exact max over Charikar's sequential peel
    # prefixes (which itself is >= OPT/2 -> found >= charikar_best /
    # (1+eps) is NOT implied, so compare to the weaker certified bound
    # via charikar_best <= OPT).
    rng = np.random.default_rng(23)
    n, m = 70, 500
    e = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    ]
    run = densest_subgraph_bsp(_graph(e), num_parts=4)
    found = run.degree_sum / (2 * run.n_members)

    und = {(min(a, b), max(a, b)) for a, b in e}
    adj = [set() for _ in range(n)]
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(range(n))
    deg = {v: len(adj[v]) for v in range(n)}
    edges_left = len(und)
    charikar_best = 0.0
    while alive:
        charikar_best = max(charikar_best, edges_left / len(alive))
        v = min(alive, key=lambda x: (deg[x], x))
        alive.remove(v)
        edges_left -= deg[v]
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
                adj[u].discard(v)
    # charikar_best >= OPT/2, so OPT <= 2*charikar_best and the Bahmani
    # bound found >= OPT/(2(1+eps)) is implied by
    # found >= charikar_best / (1+eps) when that holds; assert the
    # certified chain: found >= (2*charikar_best) / (2*(1+eps)) / 2
    eps_factor = 5 / 4
    assert found >= charikar_best / (2 * eps_factor) - 1e-12
