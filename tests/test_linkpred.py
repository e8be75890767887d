"""Link prediction + reciprocity vs brute-force oracles."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, edge_reciprocity
from parallel_pagerank_ray.pipelines.linkpred import link_prediction_topk


def _graph(edges):
    e = np.asarray(sorted(set(map(tuple, edges))), dtype=np.int64)
    t = pa.table({"src": e[:, 0], "dst": e[:, 1]})
    return Graph.from_int_edges(rd.from_arrow(t), dedup=False), e


def _brute_topk(n, e, k):
    adj = [set() for _ in range(n)]
    for u, v in e:
        adj[u].add(v)
        adj[v].add(u)
    rows = []
    for u in range(n):
        for v in range(u + 1, n):
            if v in adj[u]:
                continue
            cn = len(adj[u] & adj[v])
            if cn == 0:
                continue
            du, dv = len(adj[u]), len(adj[v])
            rows.append((cn, u, v, float(cn) / (du + dv - cn), du * dv))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    return [(u, v, cn, j, pa_) for cn, u, v, j, pa_ in rows[:k]]


def test_link_prediction_matches_bruteforce():
    rng = np.random.default_rng(3)
    for trial in range(3):
        n = int(rng.integers(10, 40))
        e = rng.integers(0, n, size=(2 * n, 2))
        e = e[e[:, 0] != e[:, 1]]
        e = np.sort(e, axis=1)  # canonical src < dst
        g, canon = _graph(e.tolist())
        got = (
            link_prediction_topk(g, k=10)
            .to_pandas()[["src", "dst", "cn", "jaccard", "pref_attach"]]
            .itertuples(index=False)
        )
        assert list(got) == _brute_topk(g.n, canon, 10), trial


def test_link_prediction_hub_cap_drops_hub_wedges():
    # star around 0 (degree 5) + one extra wedge at vertex 1
    edges = [(0, i) for i in range(1, 6)] + [(1, 6), (2, 6)]
    g, _ = _graph(edges)
    capped = link_prediction_topk(g, k=100, max_degree=4).to_pandas()
    # center 0's wedges (all pairs of 1..5) are dropped; only centers
    # with degree <= 4 contribute (vertex 6's wedge (1,2) and the
    # wedges through 1 and 2)
    assert (capped["cn"] >= 1).all()
    pairs = set(zip(capped["src"], capped["dst"]))
    assert (3, 4) not in pairs  # only co-neighbored via the capped hub
    full = link_prediction_topk(g, k=100).to_pandas()
    assert (3, 4) in set(zip(full["src"], full["dst"]))


def test_edge_reciprocity_counts():
    t = pa.table(
        {
            "src": np.array([0, 1, 1, 2, 3, 3], dtype=np.int64),
            "dst": np.array([1, 0, 2, 3, 3, 4], dtype=np.int64),
        }
    )
    df = edge_reciprocity(rd.from_arrow(t)).to_pandas()
    assert df.iloc[0].tolist() == [5, 2, 0.4]


def test_edge_reciprocity_empty_and_full():
    t = pa.table(
        {
            "src": np.array([0, 1], dtype=np.int64),
            "dst": np.array([1, 0], dtype=np.int64),
        }
    )
    assert edge_reciprocity(rd.from_arrow(t)).to_pandas().iloc[0].tolist() == [
        2,
        2,
        1.0,
    ]
    empty = pa.table(
        {
            "src": pa.array([], type=pa.int64()),
            "dst": pa.array([], type=pa.int64()),
        }
    )
    row = edge_reciprocity(rd.from_arrow(empty)).to_pandas().iloc[0]
    assert row.tolist() == [0, 0, 0.0]


def test_linkpred_training_set_laws():
    """Positives are a subset of edges; negatives are verified
    non-edges, canonical, distinct, and bounded by attempts x
    positives; the split is deterministic."""
    import pandas as pd

    from parallel_pagerank_ray.functions.hashing import md5_u64
    from parallel_pagerank_ray.pipelines.linkpred import (
        linkpred_training_set,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = np.unique(powerlaw_edges(80, 4, seed=5), axis=0)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
    g, canon = _graph(canon)
    out = linkpred_training_set(g).to_pandas()
    edge_set = {(int(a), int(b)) for a, b in canon}
    pos = out[out.label == 1]
    neg = out[out.label == 0]
    want_pos = {
        (a, b) for a, b in edge_set if md5_u64(f"lp|{a}|{b}") % 5 == 0
    }
    assert {(int(r.src), int(r.dst)) for r in pos.itertuples()} == want_pos
    negs = {(int(r.src), int(r.dst)) for r in neg.itertuples()}
    assert len(negs) == len(neg)  # distinct
    assert not (negs & edge_set)  # verified non-edges
    assert all(a < b for a, b in negs)  # canonical
    assert len(neg) <= 2 * len(pos)
    # deterministic
    out2 = linkpred_training_set(g).to_pandas()
    a = out.sort_values(["label", "src", "dst"]).reset_index(drop=True)
    b = out2.sort_values(["label", "src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_linkpred_auc_matches_bruteforce_and_join_path(ray_session):
    """linkpred_auc == the O(pos*neg) pairwise AUC definition on a
    small graph, and the join-path scorer (forced via broadcast_max=0)
    produces the identical row."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.hashing import md5_u64
    from parallel_pagerank_ray.pipelines.graph_build import Graph
    from parallel_pagerank_ray.pipelines.linkpred import (
        linkpred_auc,
        linkpred_training_set,
    )
    from parallel_pagerank_ray.sources.pages import powerlaw_edges

    e = powerlaw_edges(120, 4, seed=21)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    m = lo != hi
    canon = np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)
    g = Graph(
        n=120,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(canon[:, 0], pa.int64()),
                    "dst": pa.array(canon[:, 1], pa.int64()),
                }
            )
        ).materialize(),
    )
    got = linkpred_auc(g).to_pandas().iloc[0]
    got_join = (
        linkpred_auc(g, broadcast_max=0).to_pandas().iloc[0]
    )
    assert got.equals(got_join)

    # brute force: residual adjacency sets + pairwise comparisons
    resid = {
        (a, b)
        for a, b in map(tuple, canon)
        if md5_u64(f"lp|{a}|{b}") % 5 != 0
    }
    adj: dict[int, set] = {}
    for a, b in resid:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    train = linkpred_training_set(g).to_pandas()
    scores = [
        (
            len(adj.get(int(r.src), set()) & adj.get(int(r.dst), set())),
            int(r.label),
        )
        for r in train.itertuples()
    ]
    pos = [s for s, l in scores if l == 1]
    neg = [s for s, l in scores if l == 0]
    conc2 = sum(
        2 * (p > q) + (p == q) for p in pos for q in neg
    )
    assert int(got["n_pos"]) == len(pos)
    assert int(got["n_neg"]) == len(neg)
    assert int(got["concordant2"]) == conc2
    assert got["auc"] == conc2 / float(2 * len(pos) * len(neg))
