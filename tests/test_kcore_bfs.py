"""k-core / BFS / assortativity vs NumPy oracles — exact matches."""

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.bfs import bfs_distances_bsp
from parallel_pagerank_ray.pipelines.graph_build import (
    Graph,
    degree_assortativity_stats,
)
from parallel_pagerank_ray.pipelines.kcore import kcore_bsp
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _members(run):
    df = run.members.to_pandas()
    return sorted(df["vid"].tolist()) if len(df) else []


def test_kcore_exact_fixtures(graphs):
    for name in ("small", "medium", "two_comps", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        for k in (1, 2, 3, 4):
            run = kcore_bsp(g, k, num_parts=3)
            want = sorted(np.nonzero(oracle.kcore(n, e, k))[0].tolist())
            assert _members(run) == want, (name, k)


def test_kcore_random_powerlaw():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(300, 4, seed=11)
    g = _graph([tuple(r) for r in e])
    for k in (2, 3, 5):
        run = kcore_bsp(g, k, num_parts=4)
        want = sorted(np.nonzero(oracle.kcore(g.n, e, k))[0].tolist())
        assert _members(run) == want, k


def test_kcore_path_graph_empty_core():
    # path: 2-core is empty; peeling cascades one endpoint pair per round
    e = [(i, i + 1) for i in range(30)]
    g = _graph(e, blocks=1)
    run = kcore_bsp(g, 2, num_parts=4)
    assert _members(run) == []
    assert run.iterations >= 14  # O(n) cascade, both ends peel in parallel


def test_kcore_complete_graph_no_rounds():
    e = [(i, j) for i in range(6) for j in range(6) if i != j]
    g = _graph(e, blocks=1)
    run = kcore_bsp(g, 5, num_parts=2)
    assert _members(run) == list(range(6))
    assert run.iterations == 0  # nobody peels


def test_kcore_canonical_skip_dedup():
    e = [(0, 1), (0, 2), (1, 2), (2, 3)]
    g = _graph(e, blocks=1)
    run = kcore_bsp(g, 2, num_parts=2, edges_canonical=True)
    assert _members(run) == [0, 1, 2]


def _dist_map(run):
    df = run.distances.to_pandas()
    return dict(zip(df["vid"].tolist(), df["dist"].tolist()))


def _want_map(dist):
    return {i: int(d) for i, d in enumerate(dist) if d >= 0}


def test_bfs_undirected_exact(graphs):
    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        g = _graph(e)
        run = bfs_distances_bsp(g, [0], num_parts=3)
        want = oracle.bfs_distances(n, e, [0])
        assert _dist_map(run) == _want_map(want), name
        assert run.iterations == int(want.max())


def test_bfs_directed_and_unreachable():
    # 0->1->2, 3->2; from 0 directed: 3 unreachable
    e = [(0, 1), (1, 2), (3, 2)]
    g = _graph(e, blocks=1)
    run = bfs_distances_bsp(g, [0], directed=True, num_parts=2)
    assert _dist_map(run) == {0: 0, 1: 1, 2: 2}
    want = oracle.bfs_distances(g.n, np.array(e), [0], directed=True)
    assert _dist_map(run) == _want_map(want)


def test_bfs_multi_source():
    e = [(i, i + 1) for i in range(10)]
    g = _graph(e, blocks=1)
    run = bfs_distances_bsp(g, [0, 10], num_parts=3)
    want = oracle.bfs_distances(g.n, np.array(e), [0, 10])
    assert _dist_map(run) == _want_map(want)
    assert run.iterations == 5


def test_bfs_powerlaw_vs_oracle():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(400, 3, seed=5)
    g = _graph([tuple(r) for r in e])
    for directed in (False, True):
        run = bfs_distances_bsp(g, [0, 7], directed=directed, num_parts=4)
        want = oracle.bfs_distances(g.n, e, [0, 7], directed=directed)
        assert _dist_map(run) == _want_map(want), directed


def test_assortativity_stats_exact():
    rng = np.random.default_rng(9)
    # canonical simple undirected edges
    raw = rng.integers(0, 50, size=(300, 2))
    raw = raw[raw[:, 0] != raw[:, 1]]
    canon = np.unique(
        np.stack([raw.min(axis=1), raw.max(axis=1)], axis=1), axis=0
    )
    n = int(canon.max()) + 1
    ds = edges_dataset([tuple(r) for r in canon], num_blocks=3)
    row = degree_assortativity_stats(ds, n).to_pandas().iloc[0]
    # direct: symmetrized sums over the closure
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, canon[:, 0], 1)
    np.add.at(deg, canon[:, 1], 1)
    x = deg[canon[:, 0]]
    y = deg[canon[:, 1]]
    assert row["m2"] == 2 * len(canon)
    assert row["sum_x"] == int(x.sum() + y.sum())
    assert row["sum_xy"] == 2 * int((x * y).sum())
    assert row["sum_x2"] == int((x * x).sum() + (y * y).sum())


def test_hits_both_engines_vs_oracle(graphs):
    from parallel_pagerank_ray.pipelines.hits import hits_bsp, hits_dataset

    for name in ("small", "medium", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        want_a, want_h = oracle.hits_scores(n, e, iters=2)
        for fn in (hits_bsp, hits_dataset):
            run = fn(g, iters=2)
            df = run.scores.to_pandas().sort_values("vid")
            assert np.array_equal(df["auth"].to_numpy(), want_a), (name, fn.__name__)
            assert np.array_equal(df["hub"].to_numpy(), want_h), (name, fn.__name__)


def test_hits_powerlaw_engine_parity():
    from parallel_pagerank_ray.pipelines.hits import hits_bsp, hits_dataset
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(500, 4, seed=3)
    g = _graph([tuple(r) for r in e])
    # HITS sums are duplicate-SENSITIVE and the engine dedups edges:
    # the oracle must see the deduplicated edge set
    want_a, want_h = oracle.hits_scores(g.n, np.unique(e, axis=0), iters=3)
    for fn in (hits_bsp, hits_dataset):
        run = fn(g, iters=3)
        df = run.scores.to_pandas().sort_values("vid")
        assert np.array_equal(df["auth"].to_numpy(), want_a), fn.__name__
        assert np.array_equal(df["hub"].to_numpy(), want_h), fn.__name__


def test_hits_overflow_guard():
    import pytest

    from parallel_pagerank_ray.pipelines.hits import hits_bsp

    e = [(i, j) for i in range(20) for j in range(20) if i != j]
    g = _graph(e, blocks=1)
    with pytest.raises(OverflowError):
        hits_bsp(g, iters=12)


def test_neighbor_sample_deterministic_and_bounded():
    import hashlib

    from parallel_pagerank_ray.pipelines.neighbor_sample import neighbor_sample
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(200, 6, seed=21)
    g = _graph([tuple(r) for r in e])
    de = np.unique(e, axis=0)
    out = neighbor_sample(g, seeds=[0, 1, 2], fanouts=[4, 2]).to_pandas()
    h1 = out[out["hop"] == 1]
    h2 = out[out["hop"] == 2]
    # fanout bound per source
    assert h1.groupby("src").size().max() <= 4
    assert h2.groupby("src").size().max() <= 2
    assert set(h1["src"]) <= {0, 1, 2}
    # hop-2 sources are exactly hop-1 dsts that have out-edges
    srcs_with_out = set(de[:, 0].tolist())
    assert set(h2["src"]) == set(h1["dst"]) & srcs_with_out
    # reference: per-seed smallest-hash edges (independent scalar
    # reimplementation of the mod-2^31-1 mixing chain)
    p = (1 << 31) - 1
    s64 = int.from_bytes(hashlib.md5(b"ns").digest()[:8], "big") % p

    def hkey(s, d):
        h = (s % p) * 1000151 % p
        h = (h + d % p) % p
        h = h * 1000121 % p
        h = (h + s64) % p
        return (h * h + h) % p
    for s in (0, 1, 2):
        nbrs = sorted(set(int(d) for a, d in de if a == s))
        want = sorted(nbrs, key=lambda d: (hkey(s, d), d))[:4]
        got = sorted(
            h1[h1["src"] == s]["dst"].tolist(),
            key=lambda d: (hkey(s, d), d),
        )
        assert got == want, s
    # partitioning invariance
    out2 = neighbor_sample(
        Graph.from_int_edges(edges_dataset([tuple(r) for r in e], num_blocks=7)),
        seeds=[0, 1, 2],
        fanouts=[4, 2],
    ).to_pandas()
    key = ["hop", "src", "dst"]
    assert (
        out.sort_values(key).reset_index(drop=True)[key].equals(
            out2.sort_values(key).reset_index(drop=True)[key]
        )
    )


def test_weighted_pagerank_bsp_vs_oracle():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.pagerank_actors import pagerank_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = np.unique(powerlaw_edges(150, 5, seed=8), axis=0)
    rng = np.random.default_rng(2)
    w = rng.integers(1, 6, size=len(e)).astype(np.float64)
    n = int(e.max()) + 1
    edges = rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1], "w": w})
    ).repartition(3)
    g = Graph(n=n, edges=edges.materialize())
    run = pagerank_bsp(g, d=0.85, tol=1e-7, max_iters=500)
    got = run.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    tr = oracle.pagerank_weighted(n, e, w, d=0.85, tol=1e-7, max_iters=500)
    assert np.allclose(got, tr.ranks, atol=1e-9)
    assert run.iterations == tr.iterations
    # uniform weights reproduce the unweighted engine exactly
    edges_u = rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1], "w": np.ones(len(e))})
    ).repartition(3)
    run_u = pagerank_bsp(Graph(n=n, edges=edges_u.materialize()), tol=1e-7)
    run_p = pagerank_bsp(
        Graph(n=n, edges=rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})).materialize()),
        tol=1e-7,
    )
    a = run_u.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = run_p.ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    # weighted path multiplies by a precomputed 1/deg factor instead of
    # dividing, so agreement is to rounding, not bit-exact
    assert np.allclose(a, b, atol=1e-12)
    assert run_u.iterations == run_p.iterations


def test_dataset_engine_rejects_weighted_edges():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.pagerank import pagerank

    edges = rd.from_arrow(
        pa.table(
            {"src": [0, 1], "dst": [1, 0], "w": [1.0, 2.0]}
        )
    )
    with pytest.raises(ValueError, match="weighted"):
        pagerank(Graph(n=2, edges=edges.materialize()))


def test_weighted_lpa_bsp_vs_oracle():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.label_prop_actors import (
        label_propagation_bsp,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = np.unique(powerlaw_edges(80, 4, seed=14), axis=0)
    # canonical simple pairs with integer weights, then symmetrize
    canon = np.unique(
        np.stack([e.min(axis=1), e.max(axis=1)], axis=1), axis=0
    )
    canon = canon[canon[:, 0] != canon[:, 1]]
    rng = np.random.default_rng(1)
    w = rng.integers(1, 9, size=len(canon)).astype(np.int64)
    sym = np.concatenate([canon, canon[:, ::-1]])
    wsym = np.concatenate([w, w])
    n = int(canon.max()) + 1
    edges = rd.from_arrow(
        pa.table(
            {"src": sym[:, 0], "dst": sym[:, 1], "w": wsym.astype(np.float64)}
        )
    ).repartition(3)
    g = Graph(n=n, edges=edges.materialize())
    run = label_propagation_bsp(g, max_iters=4, edges_symmetric=True)
    got = run.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    want, rounds = oracle.label_propagation_weighted(n, sym, wsym, max_iters=4)
    assert np.array_equal(got, want)
    assert run.iterations == rounds
    # asymmetric weighted input is rejected, not silently half-weighted
    import pytest

    bad = rd.from_arrow(
        pa.table(
            {"src": canon[:, 0], "dst": canon[:, 1],
             "w": w.astype(np.float64)}
        )
    )
    with pytest.raises(ValueError, match="symmetric"):
        label_propagation_bsp(Graph(n=n, edges=bad.materialize()))


def _weighted_ds(e, w, blocks=3):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"src": e[:, 0], "dst": e[:, 1], "w": w.astype(np.float64)})
    ).repartition(blocks).materialize()


def test_sssp_bsp_vs_dijkstra():
    from parallel_pagerank_ray.pipelines.sssp import sssp_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = np.unique(powerlaw_edges(120, 4, seed=17), axis=0)
    rng = np.random.default_rng(4)
    w = rng.integers(1, 10, size=len(e)).astype(np.int64)
    n = int(e.max()) + 1
    g = Graph(n=n, edges=_weighted_ds(e, w))
    for sources in ([0], [0, 5, 9]):
        run = sssp_bsp(g, sources)
        got = dict(
            zip(
                run.distances.to_pandas()["vid"].tolist(),
                run.distances.to_pandas()["dist"].tolist(),
            )
        )
        want = oracle.sssp_weighted(n, e, w, sources)
        assert got == {i: int(d) for i, d in enumerate(want) if d >= 0}, sources


def test_sssp_relaxation_beats_hop_greedy():
    # longer-hop cheaper path must win: 0->1->2 (cost 2) vs 0->2 (cost 9)
    from parallel_pagerank_ray.pipelines.sssp import sssp_bsp

    e = np.array([[0, 1], [1, 2], [0, 2]])
    w = np.array([1, 1, 9])
    g = Graph(n=3, edges=_weighted_ds(e, w, blocks=1))
    run = sssp_bsp(g, [0])
    df = run.distances.to_pandas().sort_values("vid")
    assert df["dist"].tolist() == [0, 1, 2]


def test_sssp_rejects_unweighted():
    import pytest

    from parallel_pagerank_ray.pipelines.sssp import sssp_bsp

    g = _graph([(0, 1)], blocks=1)
    with pytest.raises(ValueError, match="weighted"):
        sssp_bsp(g, [0])


def test_fractional_weights_rejected_not_truncated():
    """w=2.7 must raise, not silently become 2 (integer-weight
    contract, same rint round-trip as _WalkShard)."""
    import pytest

    from parallel_pagerank_ray.pipelines.label_prop_actors import (
        label_propagation_bsp,
    )
    from parallel_pagerank_ray.pipelines.sssp import sssp_bsp

    e = np.array([[0, 1], [1, 0], [1, 2], [2, 1]])
    w = np.array([2.7, 2.7, 1.0, 1.0])
    g = Graph(n=3, edges=_weighted_ds(e, w, blocks=1))
    with pytest.raises(Exception, match="positive integer"):
        sssp_bsp(g, [0])
    with pytest.raises(Exception, match="positive integer"):
        label_propagation_bsp(g, max_iters=2, edges_symmetric=True)


def test_int_weights_validator():
    import pytest

    from parallel_pagerank_ray.stages.csr_store import int_weights

    assert int_weights(np.array([1.0, 2.0])).tolist() == [1, 2]
    assert int_weights(np.array([3, 4], dtype=np.int32)).dtype == np.int64
    for bad in (
        np.array([1.5]),
        np.array([0.0]),
        np.array([-1.0]),
        np.array([np.nan]),
        np.array([0], dtype=np.int64),
    ):
        with pytest.raises(ValueError, match="positive integer"):
            int_weights(bad)


def test_from_int_edges_rejects_weighted_dedup():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    edges = rd.from_arrow(
        pa.table({"src": [0], "dst": [1], "w": [2.0]})
    )
    with pytest.raises(ValueError, match="w column"):
        Graph.from_int_edges(edges)  # dedup defaults True
    g = Graph.from_int_edges(edges, dedup=False)
    assert g.n == 2 and "w" in g.edges.schema().names


def _closeness_expected(n, e, sources, directed=False):
    rows = []
    for s in sources:
        dist = oracle.bfs_distances(n, e, [s], directed=directed)
        reached = dist[dist >= 0]
        r, sd = int(len(reached)), int(reached.sum())
        ecc = int(reached.max()) if r else -1
        c = ((r - 1.0) * (r - 1.0)) / ((n - 1.0) * float(sd)) if sd > 0 else 0.0
        rows.append((s, r, sd, ecc, c))
    return rows


def test_closeness_exact_fixtures(graphs):
    from parallel_pagerank_ray.pipelines.centrality import closeness_centrality_bsp

    for name in ("small", "medium", "two_comps", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        srcs = [0, min(2, n - 1)]
        run = closeness_centrality_bsp(g, srcs, num_parts=3)
        got = list(
            zip(
                run.table.column("source").to_pylist(),
                run.table.column("n_reached").to_pylist(),
                run.table.column("sum_dist").to_pylist(),
                run.table.column("ecc").to_pylist(),
                run.table.column("closeness").to_pylist(),
            )
        )
        assert got == _closeness_expected(n, e, srcs), name


def test_closeness_directed_isolated_seed():
    # 1 -> 0: from 0 directed, nothing is reachable -> closeness 0.0
    from parallel_pagerank_ray.pipelines.centrality import closeness_centrality_bsp

    e = [(1, 0)]
    g = _graph(e, blocks=1)
    run = closeness_centrality_bsp(g, [0, 1], directed=True, num_parts=2)
    got = list(
        zip(
            run.table.column("source").to_pylist(),
            run.table.column("n_reached").to_pylist(),
            run.table.column("sum_dist").to_pylist(),
            run.table.column("ecc").to_pylist(),
            run.table.column("closeness").to_pylist(),
        )
    )
    assert got == _closeness_expected(g.n, np.array(e), [0, 1], directed=True)
    assert got[0][1:] == (1, 0, 0, 0.0)


def test_closeness_powerlaw_vs_oracle():
    from parallel_pagerank_ray.pipelines.centrality import closeness_centrality_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(400, 3, seed=5)
    g = _graph([tuple(r) for r in e])
    srcs = [0, 7, 41]
    run = closeness_centrality_bsp(g, srcs, num_parts=4)
    got = list(
        zip(
            run.table.column("source").to_pylist(),
            run.table.column("n_reached").to_pylist(),
            run.table.column("sum_dist").to_pylist(),
            run.table.column("ecc").to_pylist(),
            run.table.column("closeness").to_pylist(),
        )
    )
    assert got == _closeness_expected(g.n, e, srcs)


def _sigma_rows(run):
    df = run.counts.to_pandas()
    return sorted(
        zip(
            df["source"].tolist(),
            df["vid"].tolist(),
            df["dist"].tolist(),
            df["sigma"].tolist(),
        )
    )


def _sigma_expected(n, e, sources, directed=False):
    rows = []
    for s in sources:
        dist, sigma = oracle.shortest_path_counts(n, e, s, directed=directed)
        for v in range(n):
            if dist[v] >= 0:
                rows.append((s, v, int(dist[v]), int(sigma[v])))
    return sorted(rows)


def test_sigma_exact_fixtures(graphs):
    from parallel_pagerank_ray.pipelines.centrality import (
        shortest_path_counts_bsp,
    )

    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        g = _graph(e)
        run = shortest_path_counts_bsp(g, [0, 1], num_parts=3)
        assert _sigma_rows(run) == _sigma_expected(n, e, [0, 1]), name


def test_sigma_diamond_multiplicity():
    from parallel_pagerank_ray.pipelines.centrality import (
        shortest_path_counts_bsp,
    )

    # 0->{1,2}->3->{4,5}->6: sigma(3)=2, sigma(6)=4
    e = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 6), (5, 6)]
    g = _graph(e, blocks=1)
    run = shortest_path_counts_bsp(g, [0], directed=True, num_parts=2)
    rows = {v: (d, sg) for _, v, d, sg in _sigma_rows(run)}
    assert rows[3] == (2, 2) and rows[6] == (4, 4)
    assert _sigma_rows(run) == _sigma_expected(g.n, np.array(e), [0], directed=True)


def test_sigma_powerlaw_vs_oracle():
    from parallel_pagerank_ray.pipelines.centrality import (
        shortest_path_counts_bsp,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(300, 3, seed=8)
    g = _graph([tuple(r) for r in e])
    for directed in (False, True):
        run = shortest_path_counts_bsp(g, [0, 7], directed=directed, num_parts=4)
        assert _sigma_rows(run) == _sigma_expected(
            g.n, np.unique(e, axis=0), [0, 7], directed=directed
        ), directed


def _btw_map(run):
    df = run.scores.to_pandas()
    if len(df) == 0:  # all-zero scores -> all-empty blocks (no schema)
        return {}
    return dict(zip(df["vid"].tolist(), df["btw"].tolist()))


def test_betweenness_exact_fixtures(graphs):
    from parallel_pagerank_ray.pipelines.centrality import betweenness_bsp

    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        g = _graph(e)
        srcs = list(range(n))  # full panel == exact betweenness
        run = betweenness_bsp(g, srcs, num_parts=3)
        want = oracle.betweenness_from_sources(n, e, srcs)
        got = _btw_map(run)
        for v in range(n):
            assert abs(got.get(v, 0.0) - want[v]) < 1e-9, (name, v)


def test_betweenness_path_graph_closed_form():
    from parallel_pagerank_ray.pipelines.centrality import betweenness_bsp

    # path 0-1-2-3-4: B(v) = (#pairs through v) = i*(n-1-i) for vertex i
    e = [(i, i + 1) for i in range(4)]
    g = _graph(e, blocks=1)
    run = betweenness_bsp(g, list(range(5)), num_parts=2)
    got = _btw_map(run)
    want = {1: 3.0, 2: 4.0, 3: 3.0}
    for v, b in want.items():
        assert abs(got[v] - b) < 1e-12, v
    assert 0 not in got and 4 not in got  # endpoints have zero btw


def test_betweenness_partition_invariance_powerlaw():
    from parallel_pagerank_ray.pipelines.centrality import betweenness_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(250, 3, seed=4)
    g = _graph([tuple(r) for r in e])
    srcs = [0, 3, 17, 41]
    a = _btw_map(betweenness_bsp(g, srcs, num_parts=2))
    b = _btw_map(betweenness_bsp(g, srcs, num_parts=7))
    want = oracle.betweenness_from_sources(g.n, e, srcs)
    assert set(a) == set(b)
    # the canonical ascending-sender sequential fold makes the float64
    # sums BIT-identical across partitionings and vs the oracle
    for v in a:
        assert a[v] == b[v], v
        assert a[v] == want[v], v


def test_sweep_num_parts_and_edge_count_hint():
    import ray.data as rd

    from parallel_pagerank_ray.stages.csr_store import (
        edge_count_hint,
        sweep_num_parts,
    )

    # edge-scaled, floored at 4, capped at CPU count (session has 4)
    assert sweep_num_parts(1_000) == 4
    assert sweep_num_parts(10_000_000) == 4  # cpu cap in the test session
    ds = rd.range(10).materialize()
    assert edge_count_hint(ds) == 10
    lazy = rd.range(10).map_batches(lambda b: b, batch_format="numpy")
    # unknown metadata must return None, never execute the pipeline
    assert edge_count_hint(lazy) is None


def test_prebuilt_store_matches_selfbuilt(graphs):
    from parallel_pagerank_ray.pipelines.bfs import bfs_distances_bsp
    from parallel_pagerank_ray.pipelines.centrality import (
        betweenness_bsp,
        shortest_path_counts_bsp,
    )
    from parallel_pagerank_ray.pipelines.graph_build import undirected_edges
    from parallel_pagerank_ray.pipelines.triangles import _simple_undirected
    from parallel_pagerank_ray.stages.csr_store import EdgeShardStore

    n, e = graphs["medium"]
    g = _graph(e)
    simple = undirected_edges(_simple_undirected(g.edges), dedup=False)
    store = EdgeShardStore.build(simple, n=g.n, num_parts=3)

    a = bfs_distances_bsp(g, [0]).distances.to_pandas().sort_values("vid")
    b = bfs_distances_bsp(g, [0], store=store).distances.to_pandas().sort_values("vid")
    assert a["dist"].tolist() == b["dist"].tolist()

    sa = _sigma_rows(shortest_path_counts_bsp(g, [0], edges_canonical=False))
    sb = _sigma_rows(shortest_path_counts_bsp(g, [0], store=store))
    assert sa == sb

    ba = _btw_map(betweenness_bsp(g, [0, 1]))
    bb = _btw_map(betweenness_bsp(g, [0, 1], store=store))
    assert ba == bb  # bit-exact: canonical fold order


def _harmonic_expected(n, e, sources, directed=False):
    rows = []
    for s in sources:
        dist = oracle.bfs_distances(n, e, [s], directed=directed)
        reached = dist[dist >= 0]
        hist = np.bincount(reached) if len(reached) else np.zeros(1, np.int64)
        h = 0.0
        for d in range(1, len(hist)):  # same canonical ascending fold
            if hist[d]:
                h = h + float(hist[d]) / float(d)
        ecc = int(reached.max()) if len(reached) else 0
        rows.append((s, int(len(reached)), ecc, h))
    return rows


def test_harmonic_exact_fixtures(graphs):
    from parallel_pagerank_ray.pipelines.centrality import harmonic_centrality_bsp

    for name in ("small", "medium", "two_comps", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        srcs = [0, min(2, n - 1)]
        for parts in (1, 3):
            t = harmonic_centrality_bsp(g, srcs, num_parts=parts)
            got = list(
                zip(
                    t.column("source").to_pylist(),
                    t.column("n_reached").to_pylist(),
                    t.column("ecc").to_pylist(),
                    t.column("harmonic").to_pylist(),
                )
            )
            assert got == _harmonic_expected(n, e, srcs), (name, parts)


def test_harmonic_directed_and_isolated():
    from parallel_pagerank_ray.pipelines.centrality import harmonic_centrality_bsp

    # 1 -> 0: from 0 directed nothing reachable -> harmonic 0.0
    g = _graph([(1, 0)], blocks=1)
    t = harmonic_centrality_bsp(g, [0, 1], directed=True, num_parts=2)
    assert t.column("harmonic").to_pylist() == [0.0, 1.0]
    assert t.column("n_reached").to_pylist() == [1, 2]


def test_pseudo_diameter_double_sweep(graphs):
    from parallel_pagerank_ray.pipelines.centrality import pseudo_diameter_bsp

    for name in ("small", "medium", "two_comps", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        t = pseudo_diameter_bsp(g, start=0, sweeps=2, num_parts=3)
        lb = t.column("diameter_lb").to_pylist()[0]
        peri = t.column("peripheral").to_pylist()[0]
        # oracle: true diameter of vid 0's component + both sweeps
        d0 = oracle.bfs_distances(n, e, [0])
        ecc1 = int(d0.max())
        far1 = int(np.nonzero(d0 == ecc1)[0].min())
        d1 = oracle.bfs_distances(n, e, [far1])
        ecc2 = int(d1.max())
        want_lb = max(ecc1, ecc2)
        want_peri = far1 if ecc2 <= ecc1 else int(
            np.nonzero(d1 == ecc2)[0].min()
        )
        assert (lb, peri) == (want_lb, want_peri), name
        # lower bound never exceeds the true diameter of the component
        comp0 = oracle.connected_components(n, e) == oracle.connected_components(n, e)[0]
        true_diam = 0
        for s in np.nonzero(comp0)[0]:
            ds = oracle.bfs_distances(n, e, [int(s)])
            true_diam = max(true_diam, int(ds[ds >= 0].max()))
        assert lb <= true_diam


def test_pseudo_diameter_isolated_start():
    from parallel_pagerank_ray.pipelines.centrality import pseudo_diameter_bsp

    g = _graph([(1, 2)], blocks=1)  # vid 0 isolated
    t = pseudo_diameter_bsp(g, start=0, sweeps=3, num_parts=2)
    assert t.column("diameter_lb").to_pylist() == [0]
    assert t.column("peripheral").to_pylist() == [0]


def test_coreness_matches_python_peel():
    """coreness_bsp must equal sequential rising-threshold peeling,
    and its k-th level set must equal kcore_bsp membership."""
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.kcore import coreness_bsp, kcore_bsp

    rng = np.random.default_rng(11)
    n, m = 150, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    t = pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )
    run = coreness_bsp(Graph(n=n, edges=rd.from_arrow(t)))
    got = run.members.to_pandas().sort_values("vid")["coreness"].to_numpy()

    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = np.array([len(a) for a in adj])
    core = np.zeros(n, dtype=int)
    alive = np.ones(n, bool)
    k = 0
    while alive.any():
        k += 1
        doomed = np.nonzero(alive & (deg < k))[0]
        while len(doomed):
            for v in doomed:
                alive[v] = False
                core[v] = k - 1
                for u in adj[v]:
                    if alive[u]:
                        deg[u] -= 1
            doomed = np.nonzero(alive & (deg < k))[0]
    assert np.array_equal(got, core)
    kq = int(core.max())
    members = (
        kcore_bsp(Graph(n=n, edges=rd.from_arrow(t)), k=kq)
        .members.to_pandas()["vid"]
        .to_numpy()
    )
    assert set(members) == set(np.nonzero(core >= kq)[0].tolist())


def test_shortest_path_trace_min_parent():
    import numpy as np

    from parallel_pagerank_ray.pipelines.bfs import shortest_path_trace
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    # two parallel shortest routes 0->5: via {1,3} or {2,4}; the
    # min-parent rule must pick 5<-3? no: parent(5)=min(3,4)=3,
    # parent(3)=min(1)=1, parent(1)=0
    e = [(0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 5), (5, 6)]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    got = shortest_path_trace(g, source=0, target=5).to_pandas()
    assert got["vid"].tolist() == [0, 1, 3, 5]
    assert got["dist"].tolist() == [0, 1, 2, 3]
    assert got["pos"].tolist() == [0, 1, 2, 3]
    # default target = farthest (6 at dist 4)
    far = shortest_path_trace(g, source=0).to_pandas()
    assert far["vid"].tolist() == [0, 1, 3, 5, 6]
    # unreachable target raises
    g2 = Graph.from_int_edges(edges_dataset(e + [(8, 9)], num_blocks=2))
    try:
        shortest_path_trace(g2, source=0, target=8)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_landmark_distances_exact(graphs):
    from parallel_pagerank_ray.pipelines.bfs import landmark_distances

    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        g = _graph(e)
        marks = [0, min(2, n - 1), n - 1]
        got = (
            landmark_distances(g, marks, num_parts=3)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
        assert got["vid"].tolist() == list(range(n)), name
        for i, l in enumerate(marks):
            want = oracle.bfs_distances(n, e, [l])
            assert got[f"d{i}"].tolist() == want.tolist(), (name, l)


def test_landmark_distances_edge_cases():
    from parallel_pagerank_ray.pipelines.bfs import landmark_distances

    # unreachable component -> -1 columns; duplicate landmarks allowed
    e = [(0, 1), (2, 3)]
    g = _graph(e, blocks=1)
    got = (
        landmark_distances(g, [0, 0], num_parts=2)
        .to_pandas()
        .sort_values("vid")
    )
    assert got["d0"].tolist() == [0, 1, -1, -1]
    assert got["d1"].tolist() == got["d0"].tolist()
    # empty panel -> empty typed dataset (to_pandas drops cols on
    # empty Ray datasets; assert the schema instead)
    empty = landmark_distances(g, [])
    assert empty.count() == 0 and empty.schema().names == ["vid"]
    # out-of-range landmark raises before any actor spawn
    try:
        landmark_distances(g, [99])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_bfs_routed_seed_dataset_matches_list_seeding():
    """sources_ds (per-shard routed seeding, no driver seed array)
    must equal the sources=list path on the same graph."""
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.bfs import bfs_distances_bsp
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    n = 300
    e = powerlaw_edges(n, 5, seed=3)
    g = Graph(
        n=n,
        edges=rd.from_arrow(
            pa.table({"src": e[:, 0], "dst": e[:, 1]})
        ).materialize(),
    )
    seeds = [0, 7, 131, 250]
    a = (
        bfs_distances_bsp(g, sources=seeds, num_parts=4)
        .distances.to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    sds = rd.from_items([{"vid": s} for s in seeds])
    g2 = Graph(
        n=n,
        edges=rd.from_arrow(
            pa.table({"src": e[:, 0], "dst": e[:, 1]})
        ).materialize(),
    )
    b = (
        bfs_distances_bsp(g2, sources_ds=sds, num_parts=4)
        .distances.to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # out-of-range dataset seeds are rejected before any actor spawn
    import pytest

    bad = rd.from_items([{"vid": n + 5}])
    with pytest.raises(ValueError):
        bfs_distances_bsp(g2, sources_ds=bad, num_parts=4)
    with pytest.raises(ValueError):
        bfs_distances_bsp(g2, sources=[0], sources_ds=sds)


def _eb_map(ds):
    df = ds.to_pandas()
    return {
        (int(r.src), int(r.dst)): float(r.ebtw) for r in df.itertuples()
    }


def test_edge_betweenness_path_graph_closed_form():
    from parallel_pagerank_ray.pipelines.centrality import (
        edge_betweenness_bsp,
    )

    # path 0-1-2-3-4, full panel: edge (i, i+1) carries (i+1)*(n-1-i)
    # pairs
    e = [(i, i + 1) for i in range(4)]
    g = _graph(e, blocks=1)
    got = _eb_map(edge_betweenness_bsp(g, list(range(5)), num_parts=2))
    want = {(0, 1): 4.0, (1, 2): 6.0, (2, 3): 6.0, (3, 4): 4.0}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_edge_betweenness_brute_and_partition_invariance():
    from parallel_pagerank_ray.pipelines.centrality import (
        edge_betweenness_bsp,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(120, 3, seed=6)
    g = _graph([tuple(r) for r in e])
    srcs = [0, 3, 17]
    a = _eb_map(edge_betweenness_bsp(g, srcs, num_parts=2))
    b = _eb_map(edge_betweenness_bsp(g, srcs, num_parts=5))
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k], k  # bit-identical across partitionings

    # brute-force Brandes edge betweenness (float tolerance — the
    # canonical-fold bitwise claim is covered by the SQL gate)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = {tuple(r) for r in np.stack([lo[m], hi[m]], axis=1).tolist()}
    adj: dict = {}
    for u, v in canon:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want: dict = {}
    for s in srcs:
        from collections import deque

        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            for w in sorted(adj.get(v, ())):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                    order.append(w)
                    sigma[w] = 0
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for u in sorted(adj.get(w, ())):
                if u in dist and dist[u] == dist[w] - 1:
                    c = sigma[u] * (1.0 + delta[w]) / sigma[w]
                    key = (min(u, w), max(u, w))
                    want[key] = want.get(key, 0.0) + c
                    delta[u] += c
    for k in set(want) | set(a):
        assert abs(a.get(k, 0.0) - want.get(k, 0.0) / 2.0) < 1e-9, k
