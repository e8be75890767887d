"""Single-process NumPy oracles for the graph algorithms.

These replicate, in dense NumPy, the exact arithmetic the distributed
engine must match:

- ``pagerank``: the reference MPI power iteration
  (``/root/reference/pagerank_mpi/pagerank_mpi.c:132-231``): uniform init
  ``1/N`` (Random_P_E, pagerank_mpi.c:44-54), dangling-mass sum
  (pagerank_mpi.c:166-174), per-edge contribution scatter
  (pagerank_mpi.c:178-192), the normative update operand order
  ``p1 = d*(contrib + dangling/N) + (1-d)/N`` (pagerank_mpi.c:195), and the
  dual stop rule (loop-top ``max_error <= tol`` at pagerank_mpi.c:141 plus
  in-loop ``l1 < tol`` break at pagerank_mpi.c:221-226).
- ``connected_components``: union-find over the undirected closure
  (component id = min vid in component).
- ``label_propagation``: synchronous LPA over undirected neighbors,
  most-frequent-label update with min-label tie-break (the reference has
  no LPA; this defines the engine's semantics).
- ``triangle_count``: exact triangle count of the undirected simple graph.

Used only by tests/bench as the golden reference; the engine never calls
these in its distributed path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class PageRankTrace:
    ranks: np.ndarray
    iterations: int
    exit_reason: str  # "l1" | "max_err" | "max_iters"
    # per-iteration rows: (iter, l1, max_err, dangling)
    history: list[tuple[int, float, float, float]] = field(default_factory=list)


def out_degrees(n: int, edges: np.ndarray) -> np.ndarray:
    """Out-degree per vertex; edges is an (E,2) int array (deduplicated)."""
    deg = np.zeros(n, dtype=np.int64)
    if len(edges):
        np.add.at(deg, edges[:, 0], 1)
    return deg


def pagerank(
    n: int,
    edges: np.ndarray,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 1000,
    e: np.ndarray | None = None,
    init: np.ndarray | None = None,
) -> PageRankTrace:
    """Dense power-iteration PageRank with the reference's arithmetic.

    ``e`` is the personalization / restart vector (the reference's Node.e
    field, initialized to 1/N and never used — pagerank_mpi.h:10-14,
    pagerank_mpi.c:52; implemented properly here). ``e=None`` is the
    uniform case and reproduces the reference bit-for-bit:
    ``d*(contrib + dangling*e_v) + (1-d)*e_v`` with ``e_v = 1/n`` equals
    ``d*(contrib + dangling/n) + (1-d)/n``.
    """
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    deg = out_degrees(n, edges)
    dangling_mask = deg == 0
    src, dst = edges[:, 0], edges[:, 1]
    inv_deg = np.zeros(n, dtype=np.float64)
    nz = deg > 0
    inv_deg[nz] = 1.0 / deg[nz]

    uniform = e is None
    if not uniform:
        e = np.asarray(e, dtype=np.float64)
    if init is not None:  # warm start (incremental PageRank)
        p1 = np.asarray(init, dtype=np.float64).copy()
    else:
        p1 = np.full(n, 1.0 / n, dtype=np.float64) if uniform else e.copy()
    max_err = np.inf
    it = 0
    hist: list[tuple[int, float, float, float]] = []
    exit_reason = "max_iters"
    # loop-top guard: pagerank_mpi.c:141 (`while max_error > threshold`)
    while max_err > tol and it < max_iters:
        p0 = p1
        dangling = float(p0[dangling_mask].sum())  # pagerank_mpi.c:166-174
        contrib = np.zeros(n, dtype=np.float64)
        if len(edges):
            np.add.at(contrib, dst, p0[src] * inv_deg[src])  # c:178-192
        # normative operand order — pagerank_mpi.c:195
        if uniform:
            p1 = d * (contrib + dangling / n) + (1.0 - d) / n
        else:
            p1 = d * (contrib + dangling * e) + (1.0 - d) * e
        err = np.abs(p1 - p0)  # pagerank_mpi.c:203-209
        l1 = float(err.sum())
        max_err = float(err.max())
        it += 1
        hist.append((it, l1, max_err, dangling))
        if l1 < tol:  # pagerank_mpi.c:221-226
            exit_reason = "l1"
            break
    else:
        if max_err <= tol:
            exit_reason = "max_err"
    return PageRankTrace(ranks=p1, iterations=it, exit_reason=exit_reason, history=hist)


def connected_components(n: int, edges: np.ndarray) -> np.ndarray:
    """Weakly connected components via union-find; comp id = min vid."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in np.asarray(edges, dtype=np.int64).reshape(-1, 2):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            # union by min id keeps the invariant root == min of its tree
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def _undirected_adj(n: int, edges: np.ndarray) -> list[np.ndarray]:
    und = set()
    for u, v in np.asarray(edges, dtype=np.int64).reshape(-1, 2):
        u, v = int(u), int(v)
        if u != v:
            und.add((min(u, v), max(u, v)))
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in und:
        adj[u].append(v)
        adj[v].append(u)
    return [np.array(sorted(a), dtype=np.int64) for a in adj]


def label_propagation(
    n: int, edges: np.ndarray, max_iters: int = 10
) -> tuple[np.ndarray, int]:
    """Synchronous LPA, undirected neighbors, min-label tie-break.

    Each round every vertex simultaneously adopts the most frequent label
    among its neighbors (ties -> smallest label); isolated vertices keep
    their own label. Stops when no label changes or after ``max_iters``.
    Returns (labels, rounds_run).
    """
    adj = _undirected_adj(n, edges)
    labels = np.arange(n, dtype=np.int64)
    for rnd in range(1, max_iters + 1):
        new = labels.copy()
        for v in range(n):
            if len(adj[v]) == 0:
                continue
            neigh = labels[adj[v]]
            vals, counts = np.unique(neigh, return_counts=True)
            # max count, then min label: vals is sorted so argmax picks min
            new[v] = vals[np.argmax(counts)]
        if np.array_equal(new, labels):
            return labels, rnd - 1
        labels = new
    return labels, max_iters


def triangle_count(n: int, edges: np.ndarray) -> int:
    """Exact triangles in the undirected simple closure of the digraph."""
    adj = _undirected_adj(n, edges)
    sets = [set(a.tolist()) for a in adj]
    count = 0
    for u in range(n):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[v]:
                if w > v and w in sets[u]:
                    count += 1
    return count


def kcore(n: int, edges: np.ndarray, k: int) -> np.ndarray:
    """Membership mask of the k-core of the simple undirected closure:
    iteratively remove vertices with fewer than k alive neighbors."""
    adj = _undirected_adj(n, edges)
    alive = np.ones(n, dtype=bool)
    deg = np.array([len(a) for a in adj], dtype=np.int64)
    while True:
        doomed = [v for v in range(n) if alive[v] and deg[v] < k]
        if not doomed:
            return alive
        for v in doomed:
            alive[v] = False
        for v in doomed:
            for u in adj[v]:
                deg[u] -= 1


def modularity_moves(
    n: int,
    edges: np.ndarray,
    rounds: int = 3,
    init: "np.ndarray | None" = None,
) -> np.ndarray:
    """Synchronous monotone Louvain-style moves (the
    pipelines/modularity_moves.py rule): per round every vertex v in
    community a evaluates neighboring communities c < a with the
    integer gain 4m(k_vc - k_va) - 2 deg_v (tot_c - tot_a + deg_v),
    moving to the best strictly-positive one (ties -> min c). Returns
    the community array after ``rounds`` rounds."""
    adj = _undirected_adj(n, edges)
    deg = np.array([len(x) for x in adj], dtype=np.int64)
    m = int(deg.sum()) // 2
    comm = (
        np.arange(n, dtype=np.int64)
        if init is None
        else np.asarray(init, dtype=np.int64).copy()
    )
    for _ in range(rounds):
        tot = np.zeros(n, dtype=np.int64)
        np.add.at(tot, comm, deg)
        new = comm.copy()
        for v in range(n):
            if not len(adj[v]):
                continue
            a = int(comm[v])
            ks: dict[int, int] = {}
            for u in adj[v]:
                cu = int(comm[u])
                ks[cu] = ks.get(cu, 0) + 1
            kva = ks.get(a, 0)
            best = None
            for c, k in sorted(ks.items()):
                if c >= a:
                    continue
                gain = 4 * m * (k - kva) - 2 * int(deg[v]) * (
                    int(tot[c]) - int(tot[a]) + int(deg[v])
                )
                if gain > 0 and (best is None or gain > best[0]):
                    best = (gain, c)
            if best is not None:
                new[v] = best[1]
        comm = new
    return comm


def modularity_moves_weighted(
    n: int, sym_edges: np.ndarray, w: np.ndarray, rounds: int = 3
) -> np.ndarray:
    """Weighted variant of ``modularity_moves``: ``sym_edges`` holds
    every undirected edge in BOTH directions with int weights ``w``
    (the weighted-LPA input contract). k_vc / degrees / totals / m are
    weight sums; same monotone rule and integer gain."""
    sym_edges = np.asarray(sym_edges, dtype=np.int64).reshape(-1, 2)
    w = np.asarray(w, dtype=np.int64)
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, sym_edges[:, 0], w)
    m = int(deg.sum()) // 2
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for (a, b), ww in zip(sym_edges, w):
        adj[int(a)].append((int(b), int(ww)))
    comm = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        tot = np.zeros(n, dtype=np.int64)
        np.add.at(tot, comm, deg)
        new = comm.copy()
        for v in range(n):
            if not adj[v]:
                continue
            a = int(comm[v])
            ks: dict[int, int] = {}
            for u, ww in adj[v]:
                cu = int(comm[u])
                ks[cu] = ks.get(cu, 0) + ww
            kva = ks.get(a, 0)
            best = None
            for c, kk in sorted(ks.items()):
                if c >= a:
                    continue
                gain = 4 * m * (kk - kva) - 2 * int(deg[v]) * (
                    int(tot[c]) - int(tot[a]) + int(deg[v])
                )
                if gain > 0 and (best is None or gain > best[0]):
                    best = (gain, c)
            if best is not None:
                new[v] = best[1]
        comm = new
    return comm


def louvain_two_level(
    n: int, edges: np.ndarray, rounds1: int = 3, rounds2: int = 3
) -> np.ndarray:
    """Sequential reference for pipelines/modularity_moves.py::
    louvain_two_level: monotone moves, self-loop-free quotient
    contraction (weight = canonical-edge count between communities),
    weighted monotone moves, composition."""
    l1 = modularity_moves(n, edges, rounds=rounds1)
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    e = e[e[:, 0] != e[:, 1]]
    canon = (
        np.unique(np.stack([e.min(axis=1), e.max(axis=1)], axis=1), axis=0)
        if len(e)
        else np.zeros((0, 2), dtype=np.int64)
    )
    q: dict[tuple[int, int], int] = {}
    for a, b in canon:
        ca, cb = int(l1[a]), int(l1[b])
        if ca == cb:
            continue
        key = (min(ca, cb), max(ca, cb))
        q[key] = q.get(key, 0) + 1
    if not q:
        return l1
    keys = sorted(q)
    sym = np.array(
        [(a, b) for a, b in keys] + [(b, a) for a, b in keys],
        dtype=np.int64,
    )
    w = np.array([q[k] for k in keys] * 2, dtype=np.int64)
    l2 = modularity_moves_weighted(n, sym, w, rounds=rounds2)
    return l2[l1]


def trussness(n: int, edges: np.ndarray) -> np.ndarray:
    """(src, dst, trussness) rows (canonical src < dst order) for the
    simple undirected closure: trussness(e) = largest k with e in the
    k-truss (triangle-free edges get 2). Rising-threshold synchronous
    peel — reference semantics for pipelines/ktruss.py::trussness_bsp."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    e = e[e[:, 0] != e[:, 1]]
    canon = (
        np.unique(np.stack([e.min(axis=1), e.max(axis=1)], axis=1), axis=0)
        if len(e)
        else np.zeros((0, 2), dtype=np.int64)
    )
    alive = np.ones(len(canon), dtype=bool)
    truss = np.full(len(canon), 2, dtype=np.int64)
    k = 3
    while alive.any():
        adj: dict[int, set[int]] = {}
        for i in np.nonzero(alive)[0]:
            a, b = int(canon[i, 0]), int(canon[i, 1])
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = np.zeros(len(canon), dtype=np.int64)
        for i in np.nonzero(alive)[0]:
            a, b = int(canon[i, 0]), int(canon[i, 1])
            sup[i] = len(adj[a] & adj[b])
        doomed = alive & (sup < k - 2)
        if doomed.any():
            truss[doomed] = k - 1
            alive[doomed] = False
        else:
            k += 1
    return np.concatenate([canon, truss[:, None]], axis=1)


def ktruss(n: int, edges: np.ndarray, k: int) -> np.ndarray:
    """Canonical (src < dst) edge array of the k-truss of the simple
    undirected closure: synchronously remove every edge closing fewer
    than k-2 triangles among alive edges, to the fixpoint. Reference
    semantics for both pipelines/ktruss.py engines (recomputes support
    from scratch each round — O(rounds * wedges), fixture scale)."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    e = e[e[:, 0] != e[:, 1]]
    canon = (
        np.unique(np.stack([e.min(axis=1), e.max(axis=1)], axis=1), axis=0)
        if len(e)
        else np.zeros((0, 2), dtype=np.int64)
    )
    if k <= 2 or len(canon) == 0:
        return canon
    alive = np.ones(len(canon), dtype=bool)
    while True:
        adj: dict[int, set[int]] = {}
        for i in np.nonzero(alive)[0]:
            a, b = int(canon[i, 0]), int(canon[i, 1])
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        support = np.zeros(len(canon), dtype=np.int64)
        for i in np.nonzero(alive)[0]:
            a, b = int(canon[i, 0]), int(canon[i, 1])
            support[i] = len(adj[a] & adj[b])
        doomed = alive & (support < k - 2)
        if not doomed.any():
            return canon[alive]
        alive[doomed] = False


def bfs_distances(
    n: int, edges: np.ndarray, sources: list[int], directed: bool = False
) -> np.ndarray:
    """Multi-source BFS hop counts; unreachable vertices get -1."""
    if directed:
        adj: list[list[int]] = [[] for _ in range(n)]
        for u, v in np.asarray(edges, dtype=np.int64).reshape(-1, 2):
            if int(u) != int(v):
                adj[int(u)].append(int(v))
        adj = [np.array(sorted(set(a)), dtype=np.int64) for a in adj]
    else:
        adj = _undirected_adj(n, edges)
    dist = np.full(n, -1, dtype=np.int64)
    frontier = sorted(set(int(s) for s in sources))
    for s in frontier:
        dist[s] = 0
    d = 0
    while frontier:
        d += 1
        nxt = []
        for v in frontier:
            for u in adj[v]:
                if dist[u] < 0:
                    dist[u] = d
                    nxt.append(int(u))
        frontier = nxt
    return dist


def hits_scores(
    n: int, edges: np.ndarray, iters: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Unnormalized integer HITS: (auth, hub) int64 after ``iters``
    full (authority, hub) update pairs; h_0 = 1."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    h = np.ones(n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = np.zeros(n, dtype=np.int64)
        np.add.at(a, e[:, 1], h[e[:, 0]])
        h = np.zeros(n, dtype=np.int64)
        np.add.at(h, e[:, 0], a[e[:, 1]])
    return a, h


def katz_scores(n: int, edges: np.ndarray, length: int = 4) -> np.ndarray:
    """Integer-scaled truncated Katz (alpha=1/2, scaled by 2^L):
    score[v] = sum_{k=1..L} 2^(L-k) * walks_k[v], walks_k = (A^T)^k 1."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    x = np.ones(n, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    for k in range(1, length + 1):
        nxt = np.zeros(n, dtype=np.int64)
        if len(e):
            np.add.at(nxt, e[:, 1], x[e[:, 0]])
        x = nxt
        acc += (1 << (length - k)) * x
    return acc


def pagerank_weighted(
    n: int,
    edges: np.ndarray,
    weights: np.ndarray,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 1000,
    e: np.ndarray | None = None,
) -> PageRankTrace:
    """Weighted power-iteration PageRank: edge contribution is
    p0[src] * w_e / W(src) with W = out-weight sum; dangling = vertices
    with no out-edges. Same dual stop rule as ``pagerank``.
    ``e``: personalization vector (TrustRank when concentrated on a
    trusted seed set) — init, teleport and dangling mass all use e
    instead of 1/n, matching the engine's personalized update."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    weights = np.asarray(weights, dtype=np.float64)
    src, dst = edges[:, 0], edges[:, 1]
    W = np.zeros(n, dtype=np.float64)
    if len(edges):
        np.add.at(W, src, weights)
    dangling_mask = W == 0.0
    f = np.zeros(len(edges), dtype=np.float64)
    if len(edges):
        f = weights / W[src]
    p1 = (
        np.full(n, 1.0 / n, dtype=np.float64)
        if e is None
        else np.asarray(e, dtype=np.float64).copy()
    )
    max_err = np.inf
    it = 0
    hist: list[tuple[int, float, float, float]] = []
    exit_reason = "max_iters"
    while max_err > tol and it < max_iters:
        p0 = p1
        dangling = float(p0[dangling_mask].sum())
        contrib = np.zeros(n, dtype=np.float64)
        if len(edges):
            np.add.at(contrib, dst, p0[src] * f)
        if e is None:
            p1 = d * (contrib + dangling / n) + (1.0 - d) / n
        else:
            p1 = d * (contrib + dangling * e) + (1.0 - d) * e
        err = np.abs(p1 - p0)
        l1 = float(err.sum())
        max_err = float(err.max())
        it += 1
        hist.append((it, l1, max_err, dangling))
        if l1 < tol:
            exit_reason = "l1"
            break
    else:
        if max_err <= tol:
            exit_reason = "max_err"
    return PageRankTrace(ranks=p1, iterations=it, exit_reason=exit_reason, history=hist)


def label_propagation_weighted(
    n: int,
    edges: np.ndarray,
    weights: np.ndarray,
    max_iters: int = 10,
) -> tuple[np.ndarray, int]:
    """Synchronous weighted LPA over a SYMMETRIC weighted edge list
    (each undirected edge present in both directions): each round every
    vertex adopts the label with the largest incoming weight sum (ties
    -> smallest label); isolated vertices keep their label. Integer
    weights keep the vote tally exact."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    w = np.asarray(weights, dtype=np.int64)
    labels = np.arange(n, dtype=np.int64)
    for rnd in range(1, max_iters + 1):
        new = labels.copy()
        for v in range(n):
            m = e[:, 1] == v
            if not m.any():
                continue
            mass: dict[int, int] = {}
            for u, wt in zip(e[m, 0], w[m]):
                lab = int(labels[u])
                mass[lab] = mass.get(lab, 0) + int(wt)
            best = max(mass.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if np.array_equal(new, labels):
            return labels, rnd - 1
        labels = new
    return labels, max_iters


def sssp_weighted(
    n: int,
    edges: np.ndarray,
    weights: np.ndarray,
    sources: list[int],
) -> np.ndarray:
    """Multi-source shortest path distances over a DIRECTED weighted
    edge list (positive integer weights); unreachable -> -1. Dijkstra."""
    import heapq

    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    w = np.asarray(weights, dtype=np.int64)
    adj: dict[int, list[tuple[int, int]]] = {}
    for (u, v), wt in zip(e, w):
        adj.setdefault(int(u), []).append((int(v), int(wt)))
    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, dtype=np.int64)
    heap = []
    for s in set(int(x) for x in sources):
        dist[s] = 0
        heapq.heappush(heap, (0, s))
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        for v, wt in adj.get(u, ()):
            nd = d + wt
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    dist[dist == INF] = -1
    return dist


def random_walks(
    n: int,
    edges: np.ndarray,
    seeds: list[int],
    walks_per_seed: int,
    length: int,
    salt: str = "rw",
    directed: bool = False,
) -> list[tuple[int, int, int, int]]:
    """Reference walk corpus: (seed, widx, step, vid) rows, step 0 =
    seed. Pure-int reimplementation of the normative hash (independent
    of the engine's vectorized kernel): affine chain + squaring mod
    2^31-1 over (seed, widx, step, current vid); neighbor order = dst
    ascending over the SIMPLE graph (undirected closure without self
    loops, or distinct directed pairs)."""
    import hashlib

    p = (1 << 31) - 1
    s64 = int.from_bytes(hashlib.md5(salt.encode("utf-8")).digest()[:8], "big") % p
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    adj: list[set] = [set() for _ in range(n)]
    for u, v in e:
        u, v = int(u), int(v)
        if directed:
            adj[u].add(v)
        elif u != v:
            adj[u].add(v)
            adj[v].add(u)
    nbrs = [sorted(a) for a in adj]

    def h(seed: int, widx: int, step: int, vid: int) -> int:
        x = (seed % p) * 1000151 % p
        x = (x + widx * 31 + step) % p
        x = x * 1000121 % p
        x = (x + vid % p) % p
        x = (x + s64) % p
        return (x * x + x) % p

    rows: list[tuple[int, int, int, int]] = []
    for s in seeds:
        for w in range(walks_per_seed):
            v = int(s)
            rows.append((int(s), w, 0, v))
            for t in range(1, length + 1):
                nb = nbrs[v]
                if not nb:
                    break
                v = nb[h(int(s), w, t, v) % len(nb)]
                rows.append((int(s), w, t, v))
    return rows


def shortest_path_counts(
    n: int, edges: np.ndarray, source: int, directed: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(dist, sigma) from ``source`` over the SIMPLE graph: dist = hop
    count (-1 unreachable), sigma = number of distinct shortest paths
    (Brandes' forward pass, level-synchronous)."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    adj: list[set] = [set() for _ in range(n)]
    for u, v in e:
        u, v = int(u), int(v)
        if directed:
            adj[u].add(v)
        elif u != v:
            adj[u].add(v)
            adj[v].add(u)
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.int64)
    dist[source] = 0
    sigma[source] = 1
    frontier = [int(source)]
    d = 0
    while frontier:
        d += 1
        contrib: dict[int, int] = {}
        for u in frontier:
            for v in adj[u]:
                if dist[v] < 0:
                    contrib[v] = contrib.get(v, 0) + int(sigma[u])
        frontier = sorted(contrib)
        for v in frontier:
            dist[v] = d
            sigma[v] = contrib[v]
    return dist, sigma


def random_walks_weighted(
    n: int,
    edges: np.ndarray,
    weights: np.ndarray,
    seeds: list[int],
    walks_per_seed: int,
    length: int,
    salt: str = "rw",
) -> list[tuple[int, int, int, int]]:
    """Weighted walk corpus over a caller-FINAL edge set (already
    simple; symmetric for undirected semantics): the walk draws
    r = H mod W(v) and moves to the first dst-ascending neighbor whose
    cumulative integer weight exceeds r (transition probability ∝ w)."""
    import hashlib

    p = (1 << 31) - 1
    s64 = int.from_bytes(hashlib.md5(salt.encode("utf-8")).digest()[:8], "big") % p
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    wts = np.asarray(weights, dtype=np.int64)
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for (u, v), w in zip(e, wts):
        adj[int(u)].append((int(v), int(w)))
    nbrs = [sorted(a) for a in adj]

    def h(seed: int, widx: int, step: int, vid: int) -> int:
        x = (seed % p) * 1000151 % p
        x = (x + widx * 31 + step) % p
        x = x * 1000121 % p
        x = (x + vid % p) % p
        x = (x + s64) % p
        return (x * x + x) % p

    rows: list[tuple[int, int, int, int]] = []
    for s in seeds:
        for widx in range(walks_per_seed):
            v = int(s)
            rows.append((int(s), widx, 0, v))
            for t in range(1, length + 1):
                nb = nbrs[v]
                if not nb:
                    break
                tot = sum(w for _, w in nb)
                r = h(int(s), widx, t, v) % tot
                cum = 0
                for d, w in nb:
                    cum += w
                    if r < cum:
                        v = d
                        break
                rows.append((int(s), widx, t, v))
    return rows


def per_vertex_triangles(n: int, edges: np.ndarray) -> np.ndarray:
    """int64 triangle count per vertex over the simple undirected
    closure (each triangle credits all three corners)."""
    adj = _undirected_adj(n, edges)
    sets = [set(a.tolist()) for a in adj]
    tri = np.zeros(n, dtype=np.int64)
    for v in range(n):
        nb = adj[v]
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if int(nb[j]) in sets[int(nb[i])]:
                    tri[v] += 1
    return tri


def betweenness_from_sources(
    n: int, edges: np.ndarray, sources: list[int], divide_pairs: bool = True
) -> np.ndarray:
    """Brandes betweenness dependency sums from a seed panel over the
    simple undirected closure (sources=range(n) gives the exact
    measure). ``divide_pairs`` applies the undirected halving.

    Float accumulation follows the engine's CANONICAL order so the
    comparison is bit-exact, not just allclose: per destination u,
    delta(u) = sigma(u) * fold(terms) where the fold is a strict
    left-to-right sum of (1 + delta(w)) / sigma(w) over level-(d+1)
    senders w in ascending-vid order (centrality._BrandesShardBase and
    the DuckDB list_reduce oracle use the identical order)."""
    adj = _undirected_adj(n, edges)
    btw = np.zeros(n, dtype=np.float64)
    for s in sources:
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.int64)
        dist[s] = 0
        sigma[s] = 1
        frontier = [int(s)]
        d = 0
        while frontier:
            d += 1
            contrib: dict[int, int] = {}
            for u in frontier:
                for v in adj[u]:
                    if dist[v] < 0:
                        contrib[v] = contrib.get(v, 0) + int(sigma[u])
            frontier = sorted(contrib)
            for v in frontier:
                dist[v] = d
                sigma[v] = contrib[v]
        maxd = int(dist.max(initial=0))
        delta = np.zeros(n, dtype=np.float64)
        for lev in range(maxd, 0, -1):
            senders = np.nonzero(dist == lev)[0]  # ascending vid
            terms: dict[int, float] = {}
            for w in senders:
                t = (1.0 + delta[w]) / np.float64(sigma[w])
                for u in adj[w]:
                    if dist[u] == lev - 1:
                        # strict sequential fold in ascending-w order
                        terms[int(u)] = terms.get(int(u), 0.0) + t
            for u, tsum in terms.items():
                delta[u] += np.float64(sigma[u]) * tsum
        delta[s] = 0.0
        btw += delta
    return btw / 2.0 if divide_pairs else btw


def strongly_connected_components(n: int, edges: np.ndarray) -> np.ndarray:
    """SCC via iterative Kosaraju; scc id = MAX member vid (matching
    the coloring engine's deterministic root rule, pipelines/scc.py)."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    fwd: list[list[int]] = [[] for _ in range(n)]
    bwd: list[list[int]] = [[] for _ in range(n)]
    for u, v in edges:
        fwd[int(u)].append(int(v))
        bwd[int(v)].append(int(u))
    seen = np.zeros(n, dtype=bool)
    order: list[int] = []
    for s in range(n):
        if seen[s]:
            continue
        seen[s] = True
        stack: list[tuple[int, int]] = [(s, 0)]
        while stack:
            v, i = stack[-1]
            if i < len(fwd[v]):
                stack[-1] = (v, i + 1)
                w = fwd[v][i]
                if not seen[w]:
                    seen[w] = True
                    stack.append((w, 0))
            else:
                order.append(v)
                stack.pop()
    comp = np.full(n, -1, dtype=np.int64)
    for s in reversed(order):
        if comp[s] >= 0:
            continue
        comp[s] = s
        members = [s]
        dfs = [s]
        while dfs:
            v = dfs.pop()
            for w in bwd[v]:
                if comp[w] < 0:
                    comp[w] = s
                    members.append(w)
                    dfs.append(w)
        mx = max(members)
        for v in members:
            comp[v] = mx
    return comp


def luby_mis(n: int, edges: np.ndarray) -> np.ndarray:
    """Membership mask of the deterministic Luby MIS (pipelines/mis.py
    priority rounds): each round, every alive vertex whose key is a
    strict minimum among alive neighbors joins; winners + neighbors die."""
    from parallel_pagerank_ray.pipelines.mis import mis_key

    adj = _undirected_adj(n, edges)
    key = mis_key(np.arange(n, dtype=np.int64))
    alive = np.ones(n, dtype=bool)
    mis = np.zeros(n, dtype=bool)
    while alive.any():
        winners = [
            v
            for v in range(n)
            if alive[v]
            and all(key[v] < key[u] for u in adj[v] if alive[u])
        ]
        for v in winners:
            mis[v] = True
            alive[v] = False
        for v in winners:
            for u in adj[v]:
                alive[u] = False
    return mis


def greedy_coloring(n: int, edges: np.ndarray) -> np.ndarray:
    """Sequential greedy coloring along the MIS priority order — the
    exact fixpoint Jones-Plassmann rounds (pipelines/coloring.py)
    compute in parallel."""
    from parallel_pagerank_ray.pipelines.mis import mis_key

    adj = _undirected_adj(n, edges)
    order = np.argsort(mis_key(np.arange(n, dtype=np.int64)))
    color = np.full(n, -1, dtype=np.int64)
    for v in order:
        used = {int(color[u]) for u in adj[v] if color[u] >= 0}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def handshake_matching(n: int, edges: np.ndarray) -> np.ndarray:
    """Deterministic maximal matching (pipelines/matching.py handshake
    rounds): each round every unmatched vertex proposes along its
    minimum (key, u, v) alive incident edge; reciprocated proposals
    match. Returns canonical (src, dst) rows sorted."""
    from parallel_pagerank_ray.pipelines.matching import edge_key

    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack((lo, hi), axis=1), axis=0) if len(e) else e.reshape(0, 2)
    k = edge_key(e[:, 0], e[:, 1]) if len(e) else np.array([], dtype=np.int64)
    alive_v = np.ones(n, dtype=bool)
    alive_e = np.ones(len(e), dtype=bool)
    out = []
    while True:
        idx = np.nonzero(alive_e)[0]
        if not len(idx):
            break
        best: dict[int, int] = {}
        for i in idx:
            for v in (int(e[i, 0]), int(e[i, 1])):
                j = best.get(v)
                if j is None or (int(k[i]), int(e[i, 0]), int(e[i, 1])) < (
                    int(k[j]),
                    int(e[j, 0]),
                    int(e[j, 1]),
                ):
                    best[v] = int(i)
        matched = [
            i
            for i in idx
            if best.get(int(e[i, 0])) == i and best.get(int(e[i, 1])) == i
        ]
        if not matched:
            break
        for i in matched:
            out.append((int(e[i, 0]), int(e[i, 1])))
            alive_v[e[i, 0]] = False
            alive_v[e[i, 1]] = False
        alive_e &= alive_v[e[:, 0]] & alive_v[e[:, 1]]
    return np.array(sorted(out), dtype=np.int64).reshape(-1, 2)


def dag_depth(n: int, edges: np.ndarray) -> np.ndarray:
    """Topological level of every vertex of a DAG: longest path ending
    at v (0 for sources). Kahn topological order + DP; raises
    ValueError on a cycle — the reference semantics for
    pipelines/scc.py::dag_depth_bsp."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    indeg = np.zeros(n, dtype=np.int64)
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in edges:
        adj[int(u)].append(int(v))
        indeg[int(v)] += 1
    depth = np.zeros(n, dtype=np.int64)
    queue = [v for v in range(n) if indeg[v] == 0]
    seen = 0
    while queue:
        u = queue.pop()
        seen += 1
        for w in adj[u]:
            if depth[u] + 1 > depth[w]:
                depth[w] = depth[u] + 1
            indeg[w] -= 1
            if indeg[w] == 0:
                queue.append(w)
    if seen != n:
        raise ValueError("dag_depth: input graph has a cycle")
    return depth


def ppr_push(
    n: int,
    edges: np.ndarray,
    seed: int,
    alpha_num: int = 3,
    alpha_den: int = 20,
    eps: int = 1_000_000,
    scale: int = 10**12,
    max_rounds: int = 50,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Synchronous integer ACL push (pipelines/ppr_push.py semantics):
    per round every eligible vertex (deg > 0, r >= eps*deg) pushes
    simultaneously; floor-division splits, dust stays local. Returns
    (p, r, rounds)."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    deg = np.bincount(edges[:, 0], minlength=n).astype(np.int64)
    p = np.zeros(n, dtype=np.int64)
    r = np.zeros(n, dtype=np.int64)
    r[seed] = scale
    it = 0
    while it < max_rounds:
        active = (deg > 0) & (r >= eps * deg)
        if not active.any():
            break
        it += 1
        rv = r.copy()
        incoming = np.zeros(n, dtype=np.int64)
        for v in np.nonzero(active)[0]:
            gain = (alpha_num * rv[v]) // alpha_den
            p[v] += gain
            rem = rv[v] - gain
            share = (rem - rem // 2) // deg[v]
            r[v] = rem - share * deg[v]
            for u in edges[edges[:, 0] == v, 1]:
                incoming[u] += share
        r += incoming
    return p, r, it


def wl_colors(n: int, edges: np.ndarray, rounds: int = 3) -> np.ndarray:
    """Sequential 1-WL hash-sum refinement (pipelines/wl.py arithmetic):
    color_0 = degree over the simple undirected closure; each round
    color <- (h(color) + sum_{u~v} g(color_u)) mod 2^31-1."""
    from parallel_pagerank_ray.pipelines.wl import wl_g, wl_h, P31

    adj = _undirected_adj(n, edges)
    c = np.array([len(a) for a in adj], dtype=np.int64)
    for _ in range(rounds):
        h = wl_h(c)
        g = wl_g(c)
        nxt = np.empty(n, dtype=np.int64)
        for v in range(n):
            nxt[v] = (int(h[v]) + int(g[adj[v]].sum())) % P31
        c = nxt
    return c
