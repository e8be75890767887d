"""1-WL refinement vs NumPy oracle — exact colors + refinement laws."""

import numpy as np

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.wl import wl_class_sizes, wl_refine
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _colors(run) -> np.ndarray:
    df = run.colors.to_pandas().sort_values("vid")
    return df["color"].to_numpy()


def test_wl_matches_oracle(graphs):
    for name in ("small", "medium", "dangling4"):
        n, e = graphs[name]
        got = _colors(wl_refine(_graph(e), rounds=3))
        want = oracle.wl_colors(n, np.asarray(e, dtype=np.int64), rounds=3)
        assert np.array_equal(got, want), name


def test_wl_partition_invariance_and_laws():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(300, 3, seed=7)
    n = 300
    a = _colors(wl_refine(_graph([tuple(r) for r in e], blocks=1), rounds=3))
    b = _colors(wl_refine(_graph([tuple(r) for r in e], blocks=7), rounds=3))
    assert np.array_equal(a, b)
    want = oracle.wl_colors(n, e, rounds=3)
    assert np.array_equal(a, want)
    # refinement law: round-t classes refine round-(t-1) classes —
    # vertices sharing a color at t share one at t-1 too
    c2 = _colors(wl_refine(_graph([tuple(r) for r in e]), rounds=2))
    seen: dict[int, int] = {}
    for v in range(n):
        prev = seen.setdefault(int(a[v]), int(c2[v]))
        assert prev == int(c2[v])


def test_wl_distinguishes_path_from_star_and_isolated():
    # path 0-1-2-3 vs star 4-{5,6,7}: same size/edge count, different
    # degree structure -> different class histograms after 1 round
    e = [(0, 1), (1, 2), (2, 3), (4, 5), (4, 6), (4, 7), (8, 8)]
    run = wl_refine(_graph(e), rounds=3)
    cols = _colors(run)
    # vertex 8's only edge is a self-loop (dropped by the closure) ->
    # isolated; its color differs from every degree>=1 vertex
    assert cols[8] not in set(cols[:8])
    # path interior (1,2) symmetric; path ends (0,3) symmetric
    assert cols[0] == cols[3] and cols[1] == cols[2]
    assert cols[0] != cols[1]
    # star leaves symmetric, hub distinct
    assert cols[5] == cols[6] == cols[7] != cols[4]
    # leaves differ from path ends (their neighbor is deg-3, not deg-2)
    assert cols[5] != cols[0]
    hist = wl_class_sizes(run).to_pandas()
    assert int(hist["cnt"].sum()) == 9
    # classes: path ends, path interior, star hub, star leaves, isolated
    assert len(hist) == 5


def test_rich_club_counts():
    from parallel_pagerank_ray.pipelines.community import rich_club

    # star 0-{1..4} plus triangle 5-6-7: degs 0:4, 1-4:1, 5-7:2
    e = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (6, 7), (5, 7)]
    out = (
        rich_club(_graph(e), ks=(0, 1, 2, 3))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = {
        # k: (n_nodes deg>k, n_edges both>k)
        0: (8, 7),
        1: (4, 3),  # {0,5,6,7}; triangle edges
        2: (1, 0),  # {0}
        3: (1, 0),
    }
    for r in out.itertuples():
        nn, ee = want[int(r.k)]
        assert (int(r.n_nodes), int(r.n_edges)) == (nn, ee), r.k
        exp_phi = (2.0 * ee) / (nn * (nn - 1)) if nn >= 2 else 0.0
        assert r.phi == exp_phi


def test_wl_join_fallback_identical():
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(150, 3, seed=9)
    g = _graph([tuple(r) for r in e])
    fast = _colors(wl_refine(g, rounds=2))
    slow = _colors(wl_refine(g, rounds=2, broadcast_max=0))
    assert np.array_equal(fast, slow)


def test_rich_club_join_fallback_identical():
    from parallel_pagerank_ray.pipelines.community import rich_club
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(120, 4, seed=5)
    g = _graph([tuple(r) for r in e])
    a = rich_club(g).to_pandas().sort_values("k").reset_index(drop=True)
    b = (
        rich_club(g, broadcast_max=0)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_component_wl_classes_groups_isomorphic_components(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.wl import component_wl_classes

    # three disjoint triangles + two disjoint 4-paths + one star(4):
    # classes: {triangle x3}, {path4 x2}, {star x1}
    e = []
    for base in (0, 10, 20):
        e += [(base, base + 1), (base + 1, base + 2), (base, base + 2)]
    for base in (30, 40):
        e += [(base, base + 1), (base + 1, base + 2), (base + 2, base + 3)]
    e += [(50, 51), (50, 52), (50, 53), (50, 54)]
    arr = np.array(e, dtype=np.int64)
    g = Graph.from_int_edges(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(arr[:, 0], pa.int64()),
                    "dst": pa.array(arr[:, 1], pa.int64()),
                }
            )
        ),
        dedup=False,
    )
    got = component_wl_classes(g).to_pandas()
    by = {
        (int(nv), int(nc))
        for nv, nc in zip(got["n_vertices"], got["n_components"])
    }
    assert by == {(3, 3), (4, 2), (5, 1)}
    assert len(got) == 3  # distinct fingerprints never merge classes


def test_wl_refine_three_paths_agree(ray_session):
    """Driver-local rounds == broadcast path == join path (forced via
    the bounds) on a random graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.wl import wl_refine

    rng = np.random.default_rng(31)
    e = rng.integers(0, 60, size=(150, 2))
    m = e[:, 0] != e[:, 1]
    g = Graph(
        n=60,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(e[m, 0], pa.int64()),
                    "dst": pa.array(e[m, 1], pa.int64()),
                }
            )
        ).materialize(),
    )

    def colors(**kw):
        return (
            wl_refine(g, rounds=3, **kw)
            .colors.to_pandas()
            .sort_values("vid")["color"]
            .to_numpy()
        )

    local = colors()
    bcast = colors(local_max_edges=0)
    joinp = colors(local_max_edges=0, broadcast_max=0)
    assert np.array_equal(local, bcast)
    assert np.array_equal(local, joinp)
