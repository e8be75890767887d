"""Parallel modularity moves (pipelines/modularity_moves.py) vs the
sequential oracle, plus quality (Q must improve on planted partitions)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.modularity_moves import (
    modularity_moves_bsp,
)


def _graph(e: np.ndarray, n: int) -> Graph:
    return Graph(
        n=n,
        edges=rd.from_arrow(
            pa.table({"src": e[:, 0], "dst": e[:, 1]})
        ).materialize(),
    )


def _run(g: Graph, rounds=3, **kw) -> np.ndarray:
    run = modularity_moves_bsp(g, rounds=rounds, **kw)
    return (
        run.labels.to_pandas().sort_values("vid")["comm"].to_numpy()
    )


def test_matches_oracle_random_partition_invariant():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    for n, d, seed in [(60, 3, 1), (150, 5, 2), (250, 7, 3)]:
        e = powerlaw_edges(n, d, seed=seed)
        want = oracle.modularity_moves(n, e, rounds=3)
        for parts in (1, 4):
            got = _run(_graph(e, n), num_parts=parts)
            assert (got == want).all(), (n, parts)


def test_two_cliques_with_bridge():
    # two K5s joined by one edge: the first clique collapses to comm 0;
    # the bridge pulls v5 (and then v6) into the singleton community 4
    # while {7,8,9} coalesce at 6 — a documented artifact of the
    # monotone min-id rule on bridges (determinism over optimality);
    # the engine must reproduce the oracle's fixpoint exactly
    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(5 + a, 5 + b) for a in range(5) for b in range(a + 1, 5)]
    e = np.array(k5a + k5b + [(4, 5)], dtype=np.int64)
    got = _run(_graph(e, 10), rounds=4)
    assert (got[:5] == 0).all()
    want = oracle.modularity_moves(10, e, rounds=4)
    assert (got == want).all()
    assert list(want[5:]) == [4, 4, 6, 6, 6]


def test_modularity_improves_on_planted_partition():
    from parallel_pagerank_ray.pipelines.community import (
        community_stats,
        modularity,
    )

    rng = np.random.default_rng(7)
    blocks, size = 5, 20
    n = blocks * size
    edges = set()
    for b in range(blocks):  # dense intra-block
        vs = range(b * size, (b + 1) * size)
        for u in vs:
            for v in rng.choice(list(vs), size=6, replace=False):
                if u != int(v):
                    edges.add((min(u, int(v)), max(u, int(v))))
    for _ in range(40):  # sparse inter-block noise
        u, v = int(rng.integers(n)), int(rng.integers(n))
        if u != v:
            edges.add((min(u, v), max(u, v)))
    e = np.array(sorted(edges), dtype=np.int64)
    g = _graph(e, n)
    comm = _run(g, rounds=4)
    labels = rd.from_arrow(
        pa.table(
            {
                "vid": np.arange(n, dtype=np.int64),
                "label": comm,
            }
        )
    )
    singletons = rd.from_arrow(
        pa.table(
            {
                "vid": np.arange(n, dtype=np.int64),
                "label": np.arange(n, dtype=np.int64),
            }
        )
    )
    q_after = modularity(community_stats(g, labels).to_pandas())
    q_before = modularity(community_stats(g, singletons).to_pandas())
    assert q_after > q_before + 0.2  # real community structure found
    # the moves should recover large blocks, not micro-fragments
    assert len(np.unique(comm)) <= 3 * blocks


def test_empty_and_isolated():
    got = _run(_graph(np.zeros((0, 2), dtype=np.int64), 5))
    assert (got == np.arange(5)).all()  # isolated vertices stay put


def test_weighted_matches_oracle_and_rejects_asymmetric():
    import pytest

    rng = np.random.default_rng(9)
    n = 80
    canon = set()
    while len(canon) < 160:
        a, b = rng.integers(0, n, 2)
        if a != b:
            canon.add((min(int(a), int(b)), max(int(a), int(b))))
    canon = sorted(canon)
    wts = rng.integers(1, 7, len(canon)).astype(np.int64)
    sym = np.array(
        [(a, b) for a, b in canon] + [(b, a) for a, b in canon],
        dtype=np.int64,
    )
    symw = np.concatenate([wts, wts])
    g = Graph(
        n=n,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": sym[:, 0],
                    "dst": sym[:, 1],
                    "w": symw.astype(np.float64),
                }
            )
        ).materialize(),
    )
    got = _run(g, rounds=3, edges_symmetric=True)
    want = oracle.modularity_moves_weighted(n, sym, symw, rounds=3)
    assert (got == want).all()
    # weighted input without the symmetric certificate is rejected
    with pytest.raises(ValueError):
        modularity_moves_bsp(g, rounds=1)


def test_louvain_two_level_matches_oracle_both_paths():
    from parallel_pagerank_ray.pipelines.modularity_moves import (
        louvain_two_level,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    for n, d, seed in [(120, 5, 2), (80, 4, 11)]:
        e = powerlaw_edges(n, d, seed=seed)
        want = oracle.louvain_two_level(n, e)
        for bmax in (256 << 20, 0):  # broadcast path, forced joins
            g = _graph(e, n)
            run = louvain_two_level(g, broadcast_max_bytes=bmax)
            got = (
                run.labels.to_pandas()
                .sort_values("vid")["comm"]
                .to_numpy()
            )
            assert (got == want).all(), (n, bmax)


def test_louvain_two_level_improves_over_one_level():
    """On a hierarchical planted graph (tight 10-blocks inside loose
    30-super-blocks) level 2 must merge level-1 fragments: fewer
    communities, modularity not worse."""
    from parallel_pagerank_ray.pipelines.community import (
        community_stats,
        modularity,
    )
    from parallel_pagerank_ray.pipelines.modularity_moves import (
        louvain_two_level,
    )

    rng = np.random.default_rng(13)
    n = 120
    edges = set()
    for b in range(12):  # tight blocks of 10
        vs = list(range(b * 10, (b + 1) * 10))
        for u in vs:
            for v in rng.choice(vs, size=4, replace=False):
                if u != int(v):
                    edges.add((min(u, int(v)), max(u, int(v))))
    for s in range(4):  # loose super-blocks of 3 blocks
        vs = list(range(s * 30, (s + 1) * 30))
        for _ in range(25):
            u, v = rng.choice(vs, size=2, replace=False)
            if u != v:
                edges.add((min(int(u), int(v)), max(int(u), int(v))))
    e = np.array(sorted(edges), dtype=np.int64)
    g = _graph(e, n)
    l1 = _run(g, rounds=3)
    run2 = louvain_two_level(_graph(e, n), rounds1=3, rounds2=3)
    l2 = run2.labels.to_pandas().sort_values("vid")["comm"].to_numpy()
    assert len(np.unique(l2)) <= len(np.unique(l1))

    def q_of(lbl):
        labels = rd.from_arrow(
            pa.table(
                {"vid": np.arange(n, dtype=np.int64), "label": lbl}
            )
        )
        return modularity(community_stats(_graph(e, n), labels).to_pandas())

    assert q_of(l2) >= q_of(l1) - 1e-12


def test_init_labels_matches_oracle_init():
    """init_labels seeding (routed per shard) must equal the oracle
    run from the same initial labeling."""
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    n = 150
    e = powerlaw_edges(n, 5, seed=21)
    rng = np.random.default_rng(4)
    init = rng.integers(0, n, n).astype(np.int64)
    lab = rd.from_arrow(
        pa.table({"vid": np.arange(n, dtype=np.int64), "comm": init})
    )
    g = _graph(e, n)
    run = modularity_moves_bsp(g, rounds=2, init_labels=lab, num_parts=4)
    got = run.labels.to_pandas().sort_values("vid")["comm"].to_numpy()
    want = oracle.modularity_moves(n, e, rounds=2, init=init)
    assert (got == want).all()
