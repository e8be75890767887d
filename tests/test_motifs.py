"""four_clique_count + partition_edge_cut vs brute-force oracles."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.partition_stats import partition_edge_cut
from parallel_pagerank_ray.pipelines.triangles import four_clique_count
from parallel_pagerank_ray.sources.pages import powerlaw_edges


def _graph(e: np.ndarray) -> Graph:
    return Graph.from_int_edges(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(e[:, 0], pa.int64()),
                    "dst": pa.array(e[:, 1], pa.int64()),
                }
            )
        )
    )


def brute_four_cliques(n: int, e: np.ndarray) -> int:
    adj = set()
    for s, d in e:
        if s != d:
            adj.add((min(s, d), max(s, d)))
    verts = sorted({v for p in adj for v in p})
    cnt = 0
    for quad in itertools.combinations(verts, 4):
        if all(
            (a, b) in adj for a, b in itertools.combinations(quad, 2)
        ):
            cnt += 1
    return cnt


def test_four_cliques_vs_brute():
    rng = np.random.default_rng(11)
    # dense-ish small graph so 4-cliques exist
    n = 18
    pairs = np.array(
        [(i, j) for i in range(n) for j in range(i + 1, n)], dtype=np.int64
    )
    mask = rng.random(len(pairs)) < 0.45
    e = pairs[mask]
    # feed both directions + dups to exercise canonicalization
    e_noisy = np.vstack([e, e[:, ::-1], e[: len(e) // 2]])
    g = _graph(e_noisy)
    expected = brute_four_cliques(n, e)
    assert expected > 0
    assert four_clique_count(g) == expected


def test_four_cliques_k5_complete():
    # K5 contains C(5,4) = 5 four-cliques
    e = np.array(
        [(i, j) for i in range(5) for j in range(i + 1, 5)], dtype=np.int64
    )
    assert four_clique_count(_graph(e)) == 5


def test_partition_cut_matches_numpy():
    e = powerlaw_edges(300, 5, seed=3)
    g = _graph(e)
    p = 8
    got = (
        partition_edge_cut(g, num_parts=p)
        .to_pandas()
        .sort_values(["scheme", "part"])
        .reset_index(drop=True)
    )
    # graph edges are deduplicated canonicalized? from_int_edges dedups
    # exact (src, dst) pairs but keeps direction
    eg = g.edges.to_pandas()[["src", "dst"]].to_numpy()
    ps = max(1, -(-g.n // p))
    for scheme, fs, fd in (
        ("hash", eg[:, 0] % p, eg[:, 1] % p),
        ("range", eg[:, 0] // ps, eg[:, 1] // ps),
    ):
        sub = got[got.scheme == scheme]
        load = np.bincount(fd, minlength=p)
        cut = np.bincount(fd[fs != fd], minlength=p)
        nz = np.flatnonzero(load)
        assert sub["part"].tolist() == nz.tolist()
        assert sub["n_edges"].tolist() == load[nz].tolist()
        assert sub["n_cut"].tolist() == cut[nz].tolist()
    # totals are scheme-invariant
    tot = got.groupby("scheme")["n_edges"].sum()
    assert tot["hash"] == tot["range"] == len(eg)


def test_four_cycle_count_matches_trace_formula():
    from parallel_pagerank_ray.pipelines.triangles import four_cycle_count

    e = powerlaw_edges(60, 4, seed=9)
    g = _graph(e)
    r = four_cycle_count(g)
    # independent oracle: closed 4-walks = tr(A^4) =
    #   sum(deg^2) + sum(deg*(deg-1)) + 8 * C4
    n = g.n
    A = np.zeros((n, n), dtype=np.int64)
    for s, d in e:
        if s != d:
            A[s, d] = 1
            A[d, s] = 1
    deg = A.sum(axis=1)
    tr4 = int(np.trace(np.linalg.matrix_power(A, 4)))
    q = (tr4 - int((deg**2).sum()) - int((deg * (deg - 1)).sum())) // 8
    assert r["four_cycles"] == q
    assert r["cycle_pairs"] == 2 * q
    assert r["dropped_centers"] == 0


def test_four_cycle_hub_cap_deterministic():
    from parallel_pagerank_ray.pipelines.triangles import four_cycle_count

    e = powerlaw_edges(60, 4, seed=9)
    g = _graph(e)
    cap = 6
    r = four_cycle_count(g, max_center_degree=cap)
    # numpy reproduction of the capped rule: centers with deg > cap
    # emit no wedges
    n = g.n
    A = np.zeros((n, n), dtype=np.int64)
    for s, d in e:
        if s != d:
            A[s, d] = 1
            A[d, s] = 1
    deg = A.sum(axis=1)
    keep = deg <= cap
    cn = (A[keep].T @ A[keep]).astype(np.int64)  # common capped centers
    iu = np.triu_indices(n, k=1)
    c = cn[iu]
    pairs = int((c * (c - 1) // 2).sum())
    assert r["cycle_pairs"] == pairs
    assert r["four_cycles"] == pairs // 2
    assert r["dropped_centers"] == int((~keep & (deg > 0)).sum())


def test_four_cycle_fast_kernel_matches_dataset_path(ray_session):
    """The raw-task pair-count kernel and the Dataset shuffle path are
    the same exact count (with and without the hub cap)."""
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.triangles import four_cycle_count
    from parallel_pagerank_ray.sources.pages import powerlaw_edges
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    e = powerlaw_edges(300, 4, seed=9)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
    g = Graph.from_int_edges(
        rd.from_arrow(
            pa.table({"src": canon[:, 0], "dst": canon[:, 1]})
        ),
        dedup=False,
    )
    for cap in (None, 6):
        a = four_cycle_count(g, max_center_degree=cap, edges_simple=True)
        b = four_cycle_count(
            g, max_center_degree=cap, edges_simple=True, fast=False
        )
        assert a == b
