"""SALSA closed-form scores vs Markov-chain power iteration + formula."""

import numpy as np
import pandas as pd

from parallel_pagerank_ray.pipelines.salsa import salsa_scores
from parallel_pagerank_ray.sources.edge_list import edges_dataset


def _run(e, blocks=2, **kw):
    ds = salsa_scores(edges_dataset(np.array(e, dtype=np.int64), blocks), **kw)
    return (
        ds.to_pandas()
        .sort_values(["side", "vid"])
        .reset_index(drop=True)
    )


def _salsa_stationary(e):
    """Oracle: power-iterate the authority->authority SALSA chain of a
    CONNECTED support graph (back to a uniform in-hub, forward to a
    uniform out-authority); stationary = closed form indeg/|E|."""
    e = sorted(set(map(tuple, e)))
    auths = sorted({d for _s, d in e})
    hubs = sorted({s for s, _d in e})
    ai = {a: i for i, a in enumerate(auths)}
    hi = {h: i for i, h in enumerate(hubs)}
    W = np.zeros((len(hubs), len(auths)))
    for s, d in e:
        W[hi[s], ai[d]] = 1.0
    back = W / W.sum(axis=0, keepdims=True)  # auth -> hub, column-stoch
    fwd = W / W.sum(axis=1, keepdims=True)  # hub -> auth, row-stoch
    T = back.T @ fwd  # authority chain
    pi = np.full(len(auths), 1.0 / len(auths))
    for _ in range(5000):
        nxt = pi @ T
        if np.abs(nxt - pi).sum() < 1e-14:
            break
        pi = nxt
    return dict(zip(auths, pi))


def test_connected_matches_markov_chain():
    # connected support graph: 3 hubs, 3 authorities
    e = [(0, 10), (0, 11), (1, 10), (1, 12), (2, 11), (2, 12)]
    got = _run(e)
    want = _salsa_stationary(e)
    auth = got[got.side == "auth"].set_index("vid")["score"]
    for a, pi in want.items():
        assert abs(auth[a] - pi) < 1e-12, a
    # hubs are the authorities of the reversed graph
    want_h = _salsa_stationary([(d, s) for s, d in e])
    hub = got[got.side == "hub"].set_index("vid")["score"]
    for h, pi in want_h.items():
        assert abs(hub[h] - pi) < 1e-12, h


def test_two_components_formula():
    # comp A: hub 0 -> auths {10, 11}; comp B: hubs {1, 2} -> auth 12
    e = [(0, 10), (0, 11), (1, 12), (2, 12)]
    got = _run(e)
    auth = got[got.side == "auth"].set_index("vid")
    # 3 authorities total; comp A has 2 (deg 1 each), comp B has 1
    assert auth.loc[10, "score"] == (2 * 1) / (3 * 2)
    assert auth.loc[11, "score"] == (2 * 1) / (3 * 2)
    assert auth.loc[12, "score"] == (1 * 2) / (3 * 2)
    hub = got[got.side == "hub"].set_index("vid")
    assert hub.loc[0, "score"] == (1 * 2) / (3 * 2)
    assert hub.loc[1, "score"] == (2 * 1) / (3 * 2)
    assert hub.loc[2, "score"] == (2 * 1) / (3 * 2)


def test_scores_sum_to_one_per_side():
    rng = np.random.default_rng(11)
    e = np.unique(
        np.stack([rng.integers(0, 12, 60), rng.integers(0, 12, 60)], 1),
        axis=0,
    )
    got = _run(e.tolist(), blocks=3)
    s = got.groupby("side")["score"].sum()
    assert abs(s["auth"] - 1.0) < 1e-9
    assert abs(s["hub"] - 1.0) < 1e-9


def test_dedup_invariance():
    e = [(0, 10), (0, 11), (1, 10), (1, 12), (2, 11), (2, 12)]
    a = _run(e, dedup=False)
    b = _run(e + e + e, dedup=True)
    pd.testing.assert_frame_equal(a, b)


def test_node_as_both_hub_and_authority():
    # vid 1 both emits and receives links: two chain states, one per side
    e = [(0, 1), (1, 2)]
    got = _run(e, blocks=1)
    assert set(got[got.side == "hub"]["vid"]) == {0, 1}
    assert set(got[got.side == "auth"]["vid"]) == {1, 2}


def test_join_fallback_parity():
    # broadcast_max=0 forces the join path; frames identical
    e = [(0, 10), (0, 11), (1, 10), (1, 12), (2, 11), (2, 12), (5, 13)]
    a = _run(e)
    b = _run(e, blocks=3, broadcast_max=0)
    pd.testing.assert_frame_equal(a, b)
