"""Tarjan-Vishkin biconnectivity vs sequential Hopcroft-Tarjan DFS.

The distributed construction (BFS forest + preorder intervals +
low/high folds + auxiliary-graph CC) is checked against a classic
recursive-free DFS low-link oracle on crafted topologies and seeded
power-law graphs; the level-synchronous Dataset ladder is force-tested
equal to the broadcast fast path at broadcast_max=0.
"""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.biconnectivity import (
    articulation_points,
    biconnected_edge_blocks,
    biconnectivity,
)
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.sources.pages import powerlaw_edges


def _canon(e):
    e = np.asarray(e, dtype=np.int64)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    return np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)


def _graph(canon):
    return Graph.from_int_edges(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(canon[:, 0], pa.int64()),
                    "dst": pa.array(canon[:, 1], pa.int64()),
                }
            )
        ),
        dedup=False,
    )


def _dfs_oracle(canon):
    """Iterative Hopcroft-Tarjan: (sorted articulation vids, set of
    frozenset edge-blocks)."""
    adj = collections.defaultdict(list)
    for a, b in canon:
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    disc, low = {}, {}
    arts: set[int] = set()
    blocks: list[frozenset] = []
    estack: list[tuple[int, int]] = []
    timer = [0]
    for root in sorted(adj):
        if root in disc:
            continue
        children: collections.Counter = collections.Counter()
        stack = [(root, None, iter(sorted(adj[root])))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while stack:
            v, p, it = stack[-1]
            advanced = False
            for w in it:
                if w == p:
                    continue
                if w in disc:
                    if disc[w] < disc[v]:
                        estack.append((min(v, w), max(v, w)))
                        low[v] = min(low[v], disc[w])
                else:
                    children[v] += 1
                    estack.append((min(v, w), max(v, w)))
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    stack.append((w, v, iter(sorted(adj[w]))))
                    advanced = True
                    break
            if advanced:
                continue
            stack.pop()
            if stack:
                pv = stack[-1][0]
                low[pv] = min(low[pv], low[v])
                if low[v] >= disc[pv]:
                    if stack[-1][1] is not None:
                        arts.add(pv)
                    blk = set()
                    while estack:
                        e = estack.pop()
                        blk.add(e)
                        if e == (min(pv, v), max(pv, v)):
                            break
                    blocks.append(frozenset(blk))
        if children[root] >= 2:
            arts.add(root)
    return sorted(arts), set(blocks)


def _got(g, broadcast_max=5_000_000, local_max_edges=2_000_000):
    run = biconnectivity(
        g, broadcast_max=broadcast_max, local_max_edges=local_max_edges
    )
    ap = articulation_points(g, run=run).to_pandas()
    arts = sorted(ap["vid"]) if "vid" in ap.columns else []
    eb = biconnected_edge_blocks(g, run=run).to_pandas()
    by_block = collections.defaultdict(set)
    for s, d, b in zip(eb["src"], eb["dst"], eb["block"]):
        by_block[b].add((int(s), int(d)))
    return arts, {frozenset(v) for v in by_block.values()}


CASES = [
    # two triangles sharing one cut vertex
    [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)],
    # pure path: every internal vertex cuts, every edge its own block
    [(0, 1), (1, 2), (2, 3)],
    # single cycle: biconnected, no articulation
    [(0, 1), (1, 2), (2, 3), (0, 3)],
    # cycle where EVERY vertex carries a pendant (all four articulate
    # but the cycle stays one block — the case degree-based and
    # shared-vertex heuristics get wrong)
    [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (1, 5), (2, 6), (3, 7)],
    # triangle component + path component (forest handling)
    [(0, 1), (1, 2), (0, 2), (5, 6), (6, 7)],
]


def test_crafted_topologies_match_dfs_oracle(ray_session):
    for case in CASES:
        canon = _canon(case)
        g = _graph(canon)
        exp_arts, exp_blocks = _dfs_oracle(canon)
        arts, blocks = _got(g)
        assert arts == exp_arts
        assert blocks == exp_blocks


def test_powerlaw_graphs_match_dfs_oracle(ray_session):
    for n, m, seed in [(60, 2, 3), (80, 3, 7), (120, 1, 11)]:
        canon = _canon(powerlaw_edges(n, m, seed=seed))
        g = _graph(canon)
        exp_arts, exp_blocks = _dfs_oracle(canon)
        arts, blocks = _got(g)
        assert arts == exp_arts
        assert blocks == exp_blocks


def test_distributed_ladder_matches_fast_path(ray_session):
    """All three paths agree: driver-local (default at this size),
    broadcast-sweep (local forced off), and the distributed BSP ladder
    (both bounds forced to 0)."""
    canon = _canon(powerlaw_edges(60, 2, seed=3))
    g = _graph(canon)
    local = _got(g)
    bcast = _got(g, local_max_edges=0)
    ladder = _got(g, broadcast_max=0, local_max_edges=0)
    assert bcast == local
    assert ladder == local


def test_block_count_identity(ray_session):
    # block-cut-tree identity: #blocks = #edge-bearing components
    #                                    + sum_v (pieces(v) - 1)
    canon = _canon(powerlaw_edges(80, 3, seed=7))
    g = _graph(canon)
    _, blocks = _got(g)
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))

    def comps(skip):
        seen = {skip}
        out = []
        for v in sorted(adj):
            if v in seen:
                continue
            cur = {v}
            stack = [v]
            seen.add(v)
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
                        cur.add(y)
            out.append(cur)
        return out

    base = len(comps(-1))
    pieces = sum(
        len({frozenset(c) for c in comps(v) if adj[v] & c}) - 1
        for v in sorted(adj)
    )
    assert len(blocks) == base + pieces
