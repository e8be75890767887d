"""Condensation DAG + topological depth vs NumPy oracles — the
multi-SCC structure the 11-host gate corpus can't produce (it
condenses to one component), exercised here on synthetic digraphs."""

import numpy as np
import pytest
import ray.data as rd

from parallel_pagerank_ray import oracle
from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.scc import (
    condensation,
    dag_depth_bsp,
    scc_bsp,
)
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _graph(e, blocks=2):
    return Graph.from_int_edges(edges_dataset(e, num_blocks=blocks))


def _rand_digraph(n, m, seed):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n, size=(m, 2))
    return e[e[:, 0] != e[:, 1]]


def _labels_ds(comp):
    # string component keys, like the scc_hosts family produces
    vids = np.arange(len(comp), dtype=np.int64)
    return rd.from_items(
        [
            {"vid": int(v), "scc_host": f"c{int(c):06d}"}
            for v, c in zip(vids, comp)
        ]
    )


def _oracle_condensation(n, e, comp):
    ce = {
        (int(comp[u]), int(comp[v]))
        for u, v in e
        if comp[u] != comp[v]
    }
    return sorted(ce)


def test_dag_depth_chain_and_diamond():
    # 0->1->2->3 chain plus a diamond 0->4->3
    e = np.array([[0, 1], [1, 2], [2, 3], [0, 4], [4, 3]])
    got = (
        dag_depth_bsp(_graph([tuple(r) for r in e]), num_parts=3)
        .to_pandas()
        .sort_values("vid")["depth"]
        .to_numpy()
    )
    assert got.tolist() == oracle.dag_depth(5, e).tolist() == [0, 1, 2, 3, 1]


def test_dag_depth_random_dags():
    for seed in (3, 7):
        raw = _rand_digraph(120, 500, seed)
        e = raw[raw[:, 0] < raw[:, 1]]  # forward edges only -> DAG
        g = _graph([tuple(r) for r in e], blocks=3)
        got = (
            dag_depth_bsp(g, num_parts=4)
            .to_pandas()
            .sort_values("vid")["depth"]
            .to_numpy()
        )
        assert got.tolist() == oracle.dag_depth(g.n, e).tolist(), seed


def test_dag_depth_cycle_raises():
    e = [(0, 1), (1, 2), (2, 0)]
    with pytest.raises(ValueError, match="cycle"):
        dag_depth_bsp(_graph(e), num_parts=2, max_rounds=16)
    with pytest.raises(ValueError, match="cycle"):
        oracle.dag_depth(3, np.array(e))


def test_condensation_multi_scc():
    # three SCCs in a chain plus a tail: {0,1,2} -> {3,4} -> {5}
    e = [
        (0, 1), (1, 2), (2, 0),   # cycle A
        (3, 4), (4, 3),           # cycle B
        (2, 3), (4, 5),           # A -> B -> 5
    ]
    g = _graph(e)
    comp = oracle.strongly_connected_components(g.n, np.array(e))
    run = scc_bsp(g)
    eng = run.assignments.to_pandas().sort_values("vid")["scc_id"].to_numpy()
    assert eng.tolist() == comp.tolist()
    cond = condensation(g, _labels_ds(comp))
    assert cond.n == 3
    verts = cond.vertices.to_pandas()
    key = dict(zip(verts["url"], verts["vid"]))
    ce = cond.edges.to_pandas()
    got_edges = sorted(
        (int(s), int(d))
        for s, d in zip(ce["src"], ce["dst"])
    )
    # map back to component labels for comparison
    inv = {v: k for k, v in key.items()}
    got_named = sorted((inv[s], inv[d]) for s, d in got_edges)
    want_named = sorted(
        (f"c{a:06d}", f"c{b:06d}")
        for a, b in _oracle_condensation(g.n, np.array(e), comp)
    )
    assert got_named == want_named
    depth = (
        dag_depth_bsp(cond, num_parts=2)
        .to_pandas()
        .set_index("vid")["depth"]
        .to_dict()
    )
    by_label = {inv[v]: d for v, d in depth.items()}
    assert by_label == {"c000002": 0, "c000004": 1, "c000005": 2}


def test_condensation_random_digraphs():
    for seed in (1, 5):
        e = _rand_digraph(60, 150, seed)
        g = _graph([tuple(r) for r in e], blocks=3)
        comp = oracle.strongly_connected_components(g.n, e)
        cond = condensation(g, _labels_ds(comp))
        want = _oracle_condensation(g.n, e, comp)
        if not want:
            assert cond.n == 0
            continue
        verts = cond.vertices.to_pandas()
        inv = dict(zip(verts["vid"], verts["url"]))
        ce = cond.edges.to_pandas()
        got = sorted(
            (int(inv[s][1:]), int(inv[d][1:]))
            for s, d in zip(ce["src"], ce["dst"])
        )
        assert got == want, seed
        # depth matches the oracle DP on the condensation
        nodes = sorted({a for a, _ in want} | {b for _, b in want})
        ridx = {c: i for i, c in enumerate(nodes)}
        oe = np.array([[ridx[a], ridx[b]] for a, b in want])
        od = oracle.dag_depth(len(nodes), oe)
        depth = (
            dag_depth_bsp(cond, num_parts=3)
            .to_pandas()
            .set_index("vid")["depth"]
            .to_dict()
        )
        got_d = {int(inv[v][1:]): int(d) for v, d in depth.items()}
        want_d = {c: int(od[i]) for c, i in ridx.items()}
        assert got_d == want_d, seed
