"""k-truss peeling vs a brute-force oracle (pipelines/ktruss.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.pipelines.ktruss import ktruss_edges


def _brute(n, edges, k):
    E = set(map(tuple, (sorted(e) for e in edges if e[0] != e[1])))
    changed = True
    while changed and E:
        adj = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        dead = {e for e in E if len(adj[e[0]] & adj[e[1]]) < k - 2}
        changed = bool(dead)
        E -= dead
    return sorted(E)


def _edges_of(ds):
    if ds.count() == 0:
        return []
    df = ds.to_pandas().sort_values(["src", "dst"])
    return list(map(tuple, df[["src", "dst"]].to_numpy()))


def test_ktruss_known_shape():
    # K4 plus a pendant triangle: 4-truss = the K4 only
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    extra = [(3, 4), (3, 5), (4, 5)]
    g = Graph(
        n=6,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": np.array([e[0] for e in k4 + extra], dtype=np.int64),
                    "dst": np.array([e[1] for e in k4 + extra], dtype=np.int64),
                }
            )
        ).materialize(),
    )
    assert _edges_of(ktruss_edges(g, 3)) == sorted(k4 + extra)
    assert _edges_of(ktruss_edges(g, 4)) == sorted(k4)
    assert _edges_of(ktruss_edges(g, 5)) == []


def test_ktruss_random_matches_bruteforce():
    rng = np.random.default_rng(5)
    for trial in range(3):
        n = int(rng.integers(6, 40))
        m = int(rng.integers(5, 4 * n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        g = Graph(
            n=n,
            edges=rd.from_arrow(
                pa.table({"src": e[:, 0], "dst": e[:, 1]})
            ).materialize(),
        )
        for k in (3, 4):
            assert _edges_of(ktruss_edges(g, k)) == _brute(n, e.tolist(), k), (
                trial,
                k,
            )


def test_ktruss_cascade():
    # triangle chain where removing one edge's support cascades:
    # two triangles sharing an edge; k=4 kills everything (no edge has
    # 2 triangles after the outer edges die)
    e = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    g = Graph(
        n=4,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": np.array([x[0] for x in e], dtype=np.int64),
                    "dst": np.array([x[1] for x in e], dtype=np.int64),
                }
            )
        ).materialize(),
    )
    assert _edges_of(ktruss_edges(g, 4)) == []
    assert ktruss_edges(g, 3).count() == 5


def test_ktruss_rejects_k2():
    g = Graph(n=2, edges=rd.from_items([{"src": 0, "dst": 1}]))
    import pytest

    with pytest.raises(ValueError):
        ktruss_edges(g, 2)


# --- incremental BSP engine (ktruss_bsp): same fixpoint, triangles
# enumerated once and supports maintained by decrement ---------------


def test_ktruss_bsp_known_shape():
    from parallel_pagerank_ray.pipelines.ktruss import ktruss_bsp

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    extra = [(3, 4), (3, 5), (4, 5)]
    g = Graph(
        n=6,
        edges=rd.from_arrow(
            pa.table(
                {
                    "src": np.array([e[0] for e in k4 + extra], dtype=np.int64),
                    "dst": np.array([e[1] for e in k4 + extra], dtype=np.int64),
                }
            )
        ).materialize(),
    )
    assert _edges_of(ktruss_bsp(g, 4).edges) == sorted(k4)
    assert _edges_of(ktruss_bsp(g, 5).edges) == []
    # k <= 2: nothing peels, canonical input comes back
    assert _edges_of(ktruss_bsp(g, 2).edges) == sorted(k4 + extra)


def test_ktruss_bsp_matches_bruteforce_and_dataset_engine():
    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.ktruss import ktruss_bsp

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(8, 45))
        m = int(rng.integers(6, 4 * n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        g = Graph(
            n=n,
            edges=rd.from_arrow(
                pa.table({"src": e[:, 0], "dst": e[:, 1]})
            ).materialize(),
        )
        for k in (3, 4, 5):
            want = list(map(tuple, oracle.ktruss(n, e, k)))
            assert _edges_of(ktruss_bsp(g, k).edges) == want, (trial, k)
            assert want == _brute(n, e.tolist(), k), (trial, k)


def test_ktruss_bsp_partition_invariant_cascade():
    """A cascading peel (chord deaths unzip the strip; the K5 core
    survives) must give the same edges at any shard count — each
    (triangle, edge) decrement is charged exactly once. Deep peels
    (8 rounds) are exercised by the ktruss_deep_copurchase gate."""
    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.ktruss import ktruss_bsp

    # strip of triangles (i, i+1, i+2) plus a K5 core at the far end
    strip = [(i, i + 1) for i in range(20)] + [(i, i + 2) for i in range(19)]
    k5 = [(20 + a, 20 + b) for a in range(5) for b in range(a + 1, 5)]
    e = np.array(strip + k5 + [(20, 21)], dtype=np.int64)
    n = 25
    want = list(map(tuple, oracle.ktruss(n, e, 4)))
    runs = []
    for parts in (1, 3, 7):
        g = Graph(
            n=n,
            edges=rd.from_arrow(
                pa.table({"src": e[:, 0], "dst": e[:, 1]})
            ).materialize(),
        )
        run = ktruss_bsp(g, 4, num_parts=parts)
        assert _edges_of(run.edges) == want, parts
        runs.append(run.iterations)
    assert len(set(runs)) == 1  # synchronous rounds: same depth everywhere
    assert runs[0] >= 2  # the kill actually cascades across rounds


# --- jaccard_sparsify ------------------------------------------------


def _brute_jaccard_keep(n, edges, p, q):
    adj = {}
    E = set()
    for a, b in edges:
        a, b = int(a), int(b)
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        E.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = []
    for a, b in sorted(E):
        sup = len(adj[a] & adj[b])
        if sup and q * sup >= p * (len(adj[a]) + len(adj[b]) - 2 - sup):
            out.append((a, b, sup))
    return out


def test_jaccard_sparsify_matches_bruteforce_both_paths():
    from parallel_pagerank_ray.pipelines.ktruss import jaccard_sparsify

    rng = np.random.default_rng(17)
    for trial in range(3):
        n = int(rng.integers(10, 40))
        m = int(rng.integers(8, 4 * n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        g = Graph(
            n=n,
            edges=rd.from_arrow(
                pa.table({"src": e[:, 0], "dst": e[:, 1]})
            ).materialize(),
        )
        want = _brute_jaccard_keep(n, e.tolist(), 1, 4)
        for bmax in (256 << 20, 0):  # broadcast path, then forced joins
            ds = jaccard_sparsify(
                g, tau_num=1, tau_den=4, broadcast_max_bytes=bmax
            )
            if ds.count() == 0:
                got = []
            else:
                df = ds.to_pandas().sort_values(["src", "dst"])
                got = list(
                    map(tuple, df[["src", "dst", "sup"]].to_numpy())
                )
            assert got == want, (trial, bmax)


def test_jaccard_sparsify_rejects_nonpositive_tau():
    from parallel_pagerank_ray.pipelines.ktruss import jaccard_sparsify

    g = Graph(n=2, edges=rd.from_items([{"src": 0, "dst": 1}]))
    import pytest

    with pytest.raises(ValueError):
        jaccard_sparsify(g, tau_num=0, tau_den=4)


def test_trussness_matches_oracle_partition_invariant():
    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.ktruss import trussness_bsp

    rng = np.random.default_rng(29)
    for trial in range(2):
        n = int(rng.integers(15, 50))
        m = int(rng.integers(10, 5 * n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        want = oracle.trussness(n, e)
        for parts in (1, 4):
            g = Graph(
                n=n,
                edges=rd.from_arrow(
                    pa.table({"src": e[:, 0], "dst": e[:, 1]})
                ).materialize(),
            )
            got = (
                trussness_bsp(g, num_parts=parts)
                .edges.to_pandas()
                .sort_values(["src", "dst"])
                .to_numpy()
            )
            assert got.shape == want.shape and (got == want).all(), (
                trial,
                parts,
            )
    # law: the k-truss is exactly the edges with trussness >= k
    from parallel_pagerank_ray.pipelines.ktruss import ktruss_bsp

    e = rng.integers(0, 30, size=(90, 2)).astype(np.int64)
    g = Graph(
        n=30,
        edges=rd.from_arrow(
            pa.table({"src": e[:, 0], "dst": e[:, 1]})
        ).materialize(),
    )
    tn = (
        trussness_bsp(g)
        .edges.to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    for k in (3, 4):
        g2 = Graph(
            n=30,
            edges=rd.from_arrow(
                pa.table({"src": e[:, 0], "dst": e[:, 1]})
            ).materialize(),
        )
        kt = _edges_of(ktruss_bsp(g2, k).edges)
        law = tn[tn["trussness"] >= k]
        assert kt == list(map(tuple, law[["src", "dst"]].to_numpy())), k
