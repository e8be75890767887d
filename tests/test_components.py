"""CC / LPA / triangles vs oracles — exact matches (SURVEY.md §5c)."""

import numpy as np
import pandas as pd

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.components import connected_components
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.label_prop import label_propagation
from parallel_pagerank_ray.pipelines.triangles import triangle_count
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def test_components_exact(graphs):
    for name in ("small", "two_comps", "dangling4"):
        n, e = graphs[name]
        g = _graph(e)
        run = connected_components(g, num_parts=2)
        got = run.components.to_pandas().sort_values("vid")["comp"].to_numpy()
        want = oracle.connected_components(n, e)
        assert np.array_equal(got, want), name


def test_components_isolated_vertex():
    # id gap -> isolated vertex is its own component (reference N semantics)
    g = _graph([(0, 1), (3, 4)], blocks=1)
    run = connected_components(g, num_parts=2)
    got = run.components.to_pandas().sort_values("vid")["comp"].tolist()
    assert got == [0, 0, 2, 3, 3]


def test_label_propagation_exact(graphs):
    for name in ("small", "two_comps", "medium"):
        n, e = graphs[name]
        g = _graph(e)
        run = label_propagation(g, max_iters=10, num_parts=2)
        got = run.labels.to_pandas().sort_values("vid")["label"].to_numpy()
        want, rounds = oracle.label_propagation(n, e, max_iters=10)
        assert np.array_equal(got, want), name
        assert run.iterations == rounds, name


def test_triangles_exact(graphs):
    for name, expected in (("small", 4), ("medium", 7), ("two_comps", 0)):
        n, e = graphs[name]
        g = _graph(e)
        assert triangle_count(g) == expected == oracle.triangle_count(n, e), name


def test_triangle_count_doulion(graphs):
    # rate=100 keeps every edge -> estimate == exact count; at rate<100
    # the deterministic md5 sample makes the estimate a pure function of
    # the edge set — verify against a direct reimplementation
    from parallel_pagerank_ray.functions.sampling import _bucket
    from parallel_pagerank_ray.pipelines.triangles import (
        triangle_count_doulion,
    )

    for name in ("small", "medium"):
        n, e = graphs[name]
        g = _graph(e)
        est, sampled = triangle_count_doulion(g, rate_pct=100)
        assert est == sampled == oracle.triangle_count(n, e), name

        g = _graph(e)
        est, sampled = triangle_count_doulion(g, rate_pct=50)
        canon = sorted({(min(u, v), max(u, v)) for u, v in e if u != v})
        kept = [
            (a, b)
            for a, b in canon
            if _bucket(f"{a},{b}", "doulion") < 50
        ]
        want_sampled = oracle.triangle_count(n, kept) if kept else 0
        assert sampled == want_sampled, name
        assert est == want_sampled * 100**3 // 50**3, name


def test_components_path_graph_log_rounds():
    # pointer-jumping must converge in O(log n) rounds, not O(diameter):
    # a 128-vertex path has diameter 127; require a generous log bound
    n = 128
    e = [(i, i + 1) for i in range(n - 1)]
    g = _graph(e)
    run = connected_components(g, num_parts=2)
    got = run.components.to_pandas().sort_values("vid")["comp"].to_numpy()
    assert np.array_equal(got, np.zeros(n, dtype=np.int64))
    assert run.iterations <= 18, run.iterations  # ~2*log2(128)+slack


def test_components_bsp_path_graph_log_rounds():
    from parallel_pagerank_ray.pipelines.components_actors import (
        connected_components_bsp,
    )

    n = 2048
    e = [(i, i + 1) for i in range(n - 1)]
    g = _graph(e)
    run = connected_components_bsp(g, num_parts=2)
    got = run.components.to_pandas().sort_values("vid")["comp"].to_numpy()
    assert np.array_equal(got, np.zeros(n, dtype=np.int64))
    assert run.iterations <= 26, run.iterations


def test_comp_shard_unordered_refs():
    # _CompShard normally trusts EdgeShardStore's src-sorted delivery;
    # hand it deliberately UNORDERED chunks and the defensive re-sort
    # must kick in (scatter walks CSR ranges — wrong order = wrong mins)
    import ray

    from parallel_pagerank_ray.pipelines.components_actors import _CompShard

    INT64_MAX = np.iinfo(np.int64).max
    # edges (src->dst) within one part covering vertices 0..3, shuffled
    src = np.array([3, 0, 2, 1], dtype=np.int64)
    dst = np.array([0, 1, 3, 2], dtype=np.int64)
    refs = [ray.put((src, dst))]
    a = _CompShard.options(num_cpus=0.1).remote(0, refs, 4, 4)
    cand = ray.get(ray.get(a.scatter.remote()))
    # every dst receives its src's initial label (comp[v] = v)
    want = np.full(4, INT64_MAX, dtype=np.int64)
    for s, d in zip(src, dst):
        want[d] = min(want[d], s)
    assert np.array_equal(cand, want)
    ray.kill(a)


def test_label_propagation_bsp_exact(graphs):
    from parallel_pagerank_ray.pipelines.label_prop_actors import (
        label_propagation_bsp,
    )

    for name in ("small", "two_comps", "medium"):
        n, e = graphs[name]
        g = _graph(e)
        run = label_propagation_bsp(g, max_iters=10, num_parts=2)
        got = run.labels.to_pandas().sort_values("vid")["label"].to_numpy()
        want, rounds = oracle.label_propagation(n, e, max_iters=10)
        assert np.array_equal(got, want), name
        assert run.iterations == rounds, name


def test_label_propagation_canonical_edges_skip_dedup(graphs):
    # edges_canonical=True skips the closure dedup; on an undirected-
    # canonical input (src < dst, distinct) it must be vote-identical
    # to the default path in BOTH engines
    from parallel_pagerank_ray.pipelines.label_prop_actors import (
        label_propagation_bsp,
    )

    for name in ("small", "two_comps", "medium"):
        n, e = graphs[name]
        canon = sorted({(min(u, v), max(u, v)) for u, v in e if u != v})
        want, rounds = oracle.label_propagation(n, canon, max_iters=10)
        for engine in (label_propagation, label_propagation_bsp):
            g = _graph(canon)
            run = engine(g, max_iters=10, num_parts=2, edges_canonical=True)
            got = run.labels.to_pandas().sort_values("vid")["label"].to_numpy()
            assert np.array_equal(got, want), (name, engine.__name__)
            assert run.iterations == rounds, (name, engine.__name__)


def test_dataset_cc_tolerates_weighted_store():
    """A weighted edge table must not crash the Dataset-engine scatter
    stages (CC is weight-invariant; the store's w column is dropped)."""
    import pyarrow as pa
    import ray.data as rd

    edges = rd.from_arrow(
        pa.table(
            {
                "src": [0, 1, 3],
                "dst": [1, 2, 4],
                "w": [1.0, 2.0, 1.0],
            }
        )
    )
    g = Graph(n=5, edges=edges.materialize())
    run = connected_components(g, num_parts=2)
    got = run.components.to_pandas().sort_values("vid")["comp"].tolist()
    assert got == [0, 0, 0, 3, 3]


def _pvt_df(run):
    return run.to_pandas().sort_values("vid").reset_index(drop=True)


def test_per_vertex_triangles_exact(graphs):
    from parallel_pagerank_ray.pipelines.triangles import per_vertex_triangles

    for name in ("small", "medium", "two_comps"):
        n, e = graphs[name]
        g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
        df = _pvt_df(per_vertex_triangles(g))
        want_tri = oracle.per_vertex_triangles(n, e)
        # undirected degree over the simple closure
        deg = np.zeros(n, dtype=np.int64)
        canon = set()
        for u, v in np.asarray(e).reshape(-1, 2):
            u, v = int(u), int(v)
            if u != v:
                canon.add((min(u, v), max(u, v)))
        for u, v in canon:
            deg[u] += 1
            deg[v] += 1
        keep = np.nonzero(deg >= 1)[0]
        assert df["vid"].tolist() == keep.tolist(), name
        assert df["tri"].tolist() == want_tri[keep].tolist(), name
        assert df["deg"].tolist() == deg[keep].tolist(), name
        for _, r in df.iterrows():
            want = (
                (2.0 * r["tri"]) / (r["deg"] * (r["deg"] - 1.0))
                if r["deg"] >= 2
                else 0.0
            )
            assert r["lcc"] == want, name
        # global count parity: sum(tri) == 3 * triangle_count
        from parallel_pagerank_ray.pipelines.triangles import triangle_count

        assert df["tri"].sum() == 3 * triangle_count(g)


def test_per_vertex_triangles_shuffle_fallback(graphs):
    # force the non-broadcast path by shrinking the edge bound via a
    # large synthetic n (key space >= 2^31 triggers the fallback)
    from parallel_pagerank_ray.pipelines import triangles as T

    n, e = graphs["medium"]
    g = Graph.from_int_edges(edges_dataset(e, num_blocks=2))
    g2 = Graph(n=1 << 31, edges=g.edges)  # same edges, huge id space
    df = _pvt_df(T.per_vertex_triangles(g2, num_partitions=4, num_buckets=8))
    want_tri = oracle.per_vertex_triangles(n, e)
    got = dict(zip(df["vid"], df["tri"]))
    for v, t in got.items():
        assert t == want_tri[int(v)]
    assert sum(got.values()) == want_tri.sum()


def test_bipartite_components_known_graphs():
    # even cycle C4 -> bipartite; odd cycle C3 -> not; star -> bipartite;
    # isolated vertex -> bipartite by convention (cover = two singletons)
    from parallel_pagerank_ray.pipelines.components import (
        bipartite_components,
    )

    # components: C4 on 0-3, C3 on 4-6, star center 7 leaves 8-9,
    # isolated vertex 10 (via n from id gap in an extra self-free edge)
    e = [
        (0, 1), (1, 2), (2, 3), (3, 0),          # C4
        (4, 5), (5, 6), (6, 4),                  # C3
        (7, 8), (7, 9),                          # star
        (10, 11),                                # K2 (bipartite)
    ]
    g = _graph(e, blocks=2)
    df = (
        bipartite_components(g)
        .to_pandas()
        .sort_values("comp")
        .reset_index(drop=True)
    )
    got = {
        int(r["comp"]): (int(r["n_vertices"]), bool(r["bipartite"]))
        for _, r in df.iterrows()
    }
    assert got == {
        0: (4, True),   # C4
        4: (3, False),  # C3 odd cycle
        7: (3, True),   # star
        10: (2, True),  # K2
    }
    # n_cover_comps: 2 where bipartite, 1 where an odd cycle fuses sides
    nc = dict(zip(df["comp"].astype(int), df["n_cover_comps"].astype(int)))
    assert nc == {0: 2, 4: 1, 7: 2, 10: 2}


def test_bipartite_components_odd_even_mix():
    # a 5-cycle with a pendant path stays non-bipartite; an even cycle
    # sharing no vertices stays bipartite — partition-count invariant
    from parallel_pagerank_ray.pipelines.components import (
        bipartite_components,
    )

    e = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (4, 5), (5, 6),
         (7, 8), (8, 9), (9, 10), (10, 7)]
    for parts in (2, 4):
        g = _graph(e, blocks=2)
        df = bipartite_components(g, num_parts=parts).to_pandas()
        got = dict(zip(df["comp"].astype(int), df["bipartite"].astype(bool)))
        assert got == {0: False, 7: True}


def test_incremental_components_equals_full():
    import numpy as np
    import ray.data as rd

    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.components import (
        connected_components,
    )
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.incremental import (
        incremental_components,
    )
    from parallel_pagerank_ray.sources.edge_list import edges_dataset

    n = 60
    base_e = [(i, i + 1) for i in range(0, n - 1, 2)]  # 30 two-chains
    delta_e = [(1, 2), (5, 6), (0, 59), (10, 10)]
    g = Graph.from_int_edges(edges_dataset(base_e, num_blocks=3))
    base = connected_components(g).components
    want = oracle.connected_components(
        n, np.array(base_e + delta_e, dtype=np.int64)
    )
    for bmax in (5_000_000, 0):  # broadcast path AND Dataset fallback
        got = (
            incremental_components(
                base,
                edges_dataset(delta_e, num_blocks=2),
                broadcast_max=bmax,
            )
            .to_pandas()
            .sort_values("vid")["comp"]
            .to_numpy()
        )
        assert np.array_equal(got, want), bmax
    # empty delta (all within-component) is a no-op
    same = (
        incremental_components(base, edges_dataset([(0, 1)], num_blocks=1))
        .to_pandas()
        .sort_values("vid")["comp"]
        .to_numpy()
    )
    assert np.array_equal(
        same,
        oracle.connected_components(n, np.array(base_e, dtype=np.int64)),
    )


def test_bipartite_components_fallback_path_agrees():
    """broadcast_max_bytes=0 forces the two-CC-run join fallback; both
    paths must produce identical rows."""
    from parallel_pagerank_ray.pipelines.components import (
        bipartite_components,
    )

    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(23)
    e = rng.integers(0, 30, size=(45, 2)).astype(np.int64)
    g = Graph(
        n=30,
        edges=rd.from_arrow(
            pa.table({"src": e[:, 0], "dst": e[:, 1]})
        ).materialize(),
    )
    fast = (
        bipartite_components(g)
        .to_pandas()
        .sort_values("comp")
        .reset_index(drop=True)
    )
    slow = (
        bipartite_components(g, broadcast_max_bytes=0)
        .to_pandas()
        .sort_values("comp")
        .reset_index(drop=True)
    )
    assert fast[["comp", "n_vertices", "n_cover_comps"]].equals(
        slow[["comp", "n_vertices", "n_cover_comps"]]
    )
    assert (fast["bipartite"] == slow["bipartite"]).all()


def test_robustness_curve_matches_bruteforce():
    from parallel_pagerank_ray.pipelines.components import robustness_curve
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(70, 4, seed=13)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
    g = _graph(canon)
    out = (
        robustness_curve(g, ks=(0, 3, 8))
        .to_pandas()
        .set_index("k_removed")
    )
    # brute-force per leg: degree rank (deg DESC, vid ASC), drop, CC
    deg = np.zeros(g.n, dtype=np.int64)
    for a, b in canon:
        deg[a] += 1
        deg[b] += 1
    order = np.lexsort((np.arange(g.n), -deg))
    for k in (0, 3, 8):
        hubs = set(order[:k][deg[order[:k]] > 0].tolist())
        fe = [
            (a, b)
            for a, b in canon
            if a not in hubs and b not in hubs
        ]
        verts = sorted({v for ed in fe for v in ed})
        comp = oracle.connected_components(g.n, np.array(fe)) if fe else None
        row = out.loc[k]
        assert row["n_edges"] == len(fe)
        assert row["n_vertices"] == len(verts)
        if fe:
            labels = comp[np.array(verts)]
            _, counts = np.unique(labels, return_counts=True)
            assert row["giant_size"] == counts.max()
            assert row["n_components"] == len(counts)
        else:
            assert row["giant_size"] == 0 and row["n_components"] == 0


def test_percolation_curve_matches_bruteforce():
    from parallel_pagerank_ray.functions.hashing import md5_u64
    from parallel_pagerank_ray.pipelines.components import percolation_curve
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(60, 3, seed=21)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
    g = _graph(canon)
    out = (
        percolation_curve(g, pcts=(0, 40))
        .to_pandas()
        .set_index("pct_removed")
    )
    for p in (0, 40):
        fe = [
            (a, b)
            for a, b in canon
            if md5_u64(f"pc|{a}|{b}") % 100 >= p
        ]
        verts = sorted({v for ed in fe for v in ed})
        row = out.loc[p]
        assert row["n_edges"] == len(fe)
        assert row["n_vertices"] == len(verts)
        if fe:
            comp = oracle.connected_components(g.n, np.array(fe))
            labels = comp[np.array(verts)]
            _, counts = np.unique(labels, return_counts=True)
            assert row["giant_size"] == counts.max()
            assert row["n_components"] == len(counts)


def test_curve_local_path_matches_distributed(ray_session):
    """The driver-local curve evaluator and the per-leg BSP CC path
    produce identical rows (local forced off via local_max_edges=0)."""
    from parallel_pagerank_ray.pipelines.components import (
        percolation_curve,
        robustness_curve,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(90, 3, seed=5)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
    g = _graph(canon)
    for fn, kw in (
        (robustness_curve, {"ks": (0, 2, 7)}),
        (percolation_curve, {"pcts": (0, 25, 70)}),
    ):
        a = fn(g, **kw).to_pandas()
        b = fn(g, local_max_edges=0, **kw).to_pandas()
        pd.testing.assert_frame_equal(a, b)
