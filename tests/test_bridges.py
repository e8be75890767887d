"""Cycle-space XOR bridge detection vs brute-force edge removal."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.bridges import bridges
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.sources.pages import powerlaw_edges


def _canon(e):
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


def _brute_bridges(n, canon):
    def ncc(edges):
        p = list(range(n))

        def find(x):
            while p[x] != x:
                p[x] = p[p[x]]
                x = p[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                p[ra] = rb
        return len({find(v) for v in range(n)})

    base = ncc(canon)
    out = set()
    for i in range(len(canon)):
        if ncc(np.delete(canon, i, axis=0)) > base:
            out.add((int(canon[i, 0]), int(canon[i, 1])))
    return out


def _as_set(df):
    return {(int(a), int(b)) for a, b in zip(df["src"], df["dst"])}


def test_bridges_matches_bruteforce_sparse_powerlaw():
    canon = _canon(powerlaw_edges(60, 2, seed=3))
    g = _graph(canon)
    got = _as_set(bridges(g).to_pandas())
    assert got == _brute_bridges(g.n, canon)


def test_bridges_distributed_fold_matches_fast_path():
    canon = _canon(powerlaw_edges(60, 2, seed=3))
    a = _as_set(bridges(_graph(canon)).to_pandas())
    b = _as_set(bridges(_graph(canon), broadcast_max=0).to_pandas())
    assert a == b


def test_bridges_tree_every_edge():
    # a pure tree has zero non-tree edges: every edge is a bridge
    canon = np.array([(i, i + 1) for i in range(30)], dtype=np.int64)
    got = _as_set(bridges(_graph(canon)).to_pandas())
    assert got == {(i, i + 1) for i in range(30)}


def test_bridges_cycle_none():
    canon = np.array(
        [(i, i + 1) for i in range(9)] + [(0, 9)], dtype=np.int64
    )
    got = bridges(_graph(canon)).to_pandas()
    assert len(got) == 0


def test_two_edge_components_matches_bruteforce():
    from parallel_pagerank_ray.pipelines.bridges import two_edge_components

    canon = _canon(powerlaw_edges(60, 2, seed=3))
    g = _graph(canon)
    br = _brute_bridges(g.n, canon)
    kept = np.array(
        [(a, b) for a, b in canon if (int(a), int(b)) not in br],
        dtype=np.int64,
    )
    # brute 2ecc: CC over kept, restricted to original endpoints
    p = list(range(g.n))

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for a, b in kept:
        ra, rb = find(a), find(b)
        if ra != rb:
            p[ra] = rb
    # min-vid labels
    mins: dict = {}
    for v in range(g.n):
        r = find(v)
        mins[r] = min(mins.get(r, v), v)
    verts = sorted({int(v) for e in canon for v in e})
    want = {v: mins[find(v)] for v in verts}
    got = two_edge_components(g).to_pandas()
    gm = {int(r.vid): int(r.comp2) for r in got.itertuples()}
    assert gm == want


def _brute_2cuts(n, canon):
    import itertools

    def ncc(edges):
        p = list(range(n))

        def find(x):
            while p[x] != x:
                p[x] = p[p[x]]
                x = p[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                p[ra] = rb
        return len({find(v) for v in range(n)})

    base = ncc(canon)
    es = [tuple(e) for e in canon.tolist()]
    br = {e for i, e in enumerate(es) if ncc(np.delete(canon, i, 0)) > base}
    out = set()
    for (i, e), (j, f) in itertools.combinations(enumerate(es), 2):
        if e in br or f in br:
            continue
        if ncc(np.delete(canon, [i, j], 0)) > base:
            out.add(tuple(sorted([e, f])))
    return out


def test_two_edge_cuts_matches_bruteforce():
    from parallel_pagerank_ray.pipelines.bridges import two_edge_cuts

    canon = _canon(powerlaw_edges(50, 2, seed=5))
    g = _graph(canon)
    df = two_edge_cuts(g).to_pandas()
    got = {
        tuple(
            sorted(
                [(int(r.src1), int(r.dst1)), (int(r.src2), int(r.dst2))]
            )
        )
        for r in df.itertuples()
    }
    assert got == _brute_2cuts(g.n, canon)


def test_two_edge_cuts_class_cap_drops_long_cycles():
    from parallel_pagerank_ray.pipelines.bridges import two_edge_cuts

    # a single 12-cycle: one signature class of 12 edges -> C(12,2)=66
    # pairs uncapped, 0 with max_class below 12
    canon = np.array(
        [(i, i + 1) for i in range(11)] + [(0, 11)], dtype=np.int64
    )
    g = _graph(_canon(canon))
    assert len(two_edge_cuts(g).to_pandas()) == 66
    capped = two_edge_cuts(g, max_class=11).to_pandas()
    assert len(capped) == 0
