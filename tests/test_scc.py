"""SCC + bowtie vs the Kosaraju oracle — exact matches at every shard
count, trim on/off (pipelines/scc.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.scc import bowtie_classes, scc_bsp


def _graph(n, edges):
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    t = pa.table({"src": e[:, 0], "dst": e[:, 1]})
    return Graph(n=n, edges=rd.from_arrow(t).materialize())


def _run(g, **kw):
    run = scc_bsp(g, **kw)
    df = run.assignments.to_pandas().sort_values("vid")
    assert df["vid"].tolist() == list(range(g.n))
    return df["scc_id"].to_numpy()


def test_scc_known_shapes():
    # chain + 2-cycle + tail, isolated vertex
    g = _graph(6, [(0, 1), (1, 2), (2, 1), (2, 3)])
    want = oracle.strongly_connected_components(6, np.array(g.edges.to_pandas()))
    got = _run(g)
    assert got.tolist() == [0, 2, 2, 3, 4, 5]
    assert np.array_equal(got, want)


def test_scc_single_cycle_all_one_component():
    n = 9
    g = _graph(n, [(i, (i + 1) % n) for i in range(n)])
    assert _run(g).tolist() == [n - 1] * n


def test_scc_random_matches_oracle_any_partitioning():
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(8, 90))
        m = int(rng.integers(0, 3 * n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        g = _graph(n, e)
        want = oracle.strongly_connected_components(n, e)
        for parts in (1, 3):
            for trim in (True, False):
                got = _run(g, num_parts=parts, trim=trim)
                assert np.array_equal(got, want), (trial, parts, trim)


def test_scc_self_loops_and_duplicates():
    g = _graph(4, [(0, 0), (0, 1), (0, 1), (1, 0), (2, 3)])
    assert _run(g).tolist() == [1, 1, 2, 3]


def test_scc_empty_graph():
    run = scc_bsp(Graph(n=0, edges=rd.from_items([])))
    assert run.assignments.count() == 0


def test_bowtie_classes_known_shape():
    # 0 -> (1 <-> 2) -> 3, isolated 4; core = {1, 2}
    g = _graph(5, [(0, 1), (1, 2), (2, 1), (2, 3)])
    run = scc_bsp(g)
    bt = bowtie_classes(g, run.assignments).to_pandas().sort_values("vid")
    assert bt["cls"].tolist() == ["IN", "CORE", "CORE", "OUT", "OTHER"]


def test_bowtie_matches_reachability_oracle():
    rng = np.random.default_rng(11)
    n = 40
    e = rng.integers(0, n, size=(70, 2)).astype(np.int64)
    g = _graph(n, e)
    run = scc_bsp(g)
    comp = oracle.strongly_connected_components(n, e)
    # reachability closure (tiny n)
    adj = np.zeros((n, n), dtype=bool)
    adj[e[:, 0], e[:, 1]] = True
    reach = adj.copy()
    for _ in range(n):
        new = reach | (reach @ adj)
        if (new == reach).all():
            break
        reach = new
    sizes = np.bincount(comp, minlength=n)
    giant = max(range(n), key=lambda c: (sizes[c], c))
    core = np.nonzero(comp == giant)[0]
    bt = (
        bowtie_classes(g, run.assignments, core_scc=giant)
        .to_pandas()
        .sort_values("vid")["cls"]
        .to_numpy()
    )
    for v in range(n):
        if comp[v] == giant:
            want = "CORE"
        elif reach[v, core].any():
            want = "IN"
        elif reach[core, v].any():
            want = "OUT"
        else:
            want = "OTHER"
        assert bt[v] == want, v


def test_scc_long_chain_trim_cap():
    """Pathological chain: trim peels one head per round; the cap hands
    the remainder to coloring, which must still be exact."""
    n = 30
    g = _graph(n, [(i, i + 1) for i in range(n - 1)])
    got = _run(g, max_trim_rounds=3)
    assert got.tolist() == list(range(n))  # all singletons


def test_scc_local_path_matches_bsp(ray_session):
    """Driver-local color/sweep SCC == BSP engine (local forced off)
    and the Kosaraju oracle on a random digraph."""
    rng = np.random.default_rng(23)
    n = 120
    e = rng.integers(0, n, size=(500, 2))
    g = _graph(n, e.tolist())
    local = _run(g)  # small -> local path
    bsp = _run(g, local_max_edges=0)
    want = oracle.strongly_connected_components(n, e.astype(np.int64))
    assert np.array_equal(local, bsp)
    assert np.array_equal(local, want)


def test_bowtie_local_path_matches_bsp(ray_session):
    rng = np.random.default_rng(29)
    n = 80
    e = rng.integers(0, n, size=(220, 2))
    g = _graph(n, e.tolist())
    run = scc_bsp(g)

    def rows(**kw):
        return (
            bowtie_classes(g, run.assignments, **kw)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )

    a = rows()
    b = rows(local_max_edges=0)
    assert a.equals(b)
