"""Closeness centrality for a seed set, on the BFS shard harness.

Beyond-reference capability (the reference's only per-vertex score is
PageRank, /root/reference/pagerank_mpi/pagerank_mpi.c:132-231). For
each seed s the engine runs one frontier-sparse BFS sweep and reduces
the distance slice to two int64 partials per shard — (n_reached,
sum_dist) — so the wire cost per seed is O(P), not O(n). The shard
pool (CSR build = the expensive part) is built ONCE and reused across
seeds via ``reset()``; rounds are ~ms on real link graphs.

Closeness here is the Wasserman–Faust form for possibly-disconnected
graphs::

    C(s) = ((r-1)/(n-1)) * ((r-1)/sum_d)  =  (r-1)^2 / ((n-1)*sum_d)

with r = vertices reached from s (incl. s) and sum_d = sum of hop
distances. All inputs are exact int64 and the score is ONE IEEE
division of exactly-representable operands, so the result is
bit-reproducible at any parallelism (the driver-gate float policy).

At 10^12-vertex scale the per-seed sweep is the same O(E) total
exchange as BFS; computing closeness for ALL vertices is O(nE) and out
of scope — the operator is for seed panels (landmark centrality),
which is how closeness is estimated at web scale anyway.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray

from parallel_pagerank_ray.pipelines.bfs import _BFSShard, _run_bfs_rounds
from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import (
    cap_num_parts,
    EdgeShardStore,
    edge_count_hint,
    per_actor_cpus,
    sweep_num_parts,
)


@dataclass
class ClosenessRun:
    table: pa.Table  # (source, n_reached, sum_dist, ecc, closeness)
    history: list[dict] = field(default_factory=list)


@dataclass
class SigmaRun:
    counts: "object"  # Dataset (source, vid, dist, sigma), reached only
    history: list[dict] = field(default_factory=list)


def _exact_group_sum(inv: np.ndarray, w: np.ndarray, size: int) -> np.ndarray:
    """Exact int64 grouped sum (np.add.at — np.bincount(weights=...)
    accumulates in float64 and silently rounds above 2^53). A float64
    shadow sum guards magnitude: int64 wraparound is undetectable after
    the fact, so raise while the approximation still shows the sum
    approaching the headroom (2^61 leaves the shadow's ulp error
    orders of magnitude below the threshold)."""
    out = np.zeros(size, dtype=np.int64)
    np.add.at(out, inv, w)
    approx = np.bincount(inv, weights=w.astype(np.float64), minlength=size)
    if approx.max(initial=0.0) > float(1 << 61):
        raise OverflowError(
            "shortest-path counts exceed int64 headroom; "
            "the graph is too dense/deep for exact sigma"
        )
    return out


class _SigmaShardBase:
    """BFS shard that also tracks sigma = number of distinct shortest
    paths from the seed (Brandes' forward pass). Level-synchronous:
    every vertex reached at depth d receives sigma = sum of the sigmas
    of its depth-(d-1) in-neighbors — exchanged as per-owner
    (ids, contribs) pairs, locally pre-summed per destination (the
    map-side combine), so the wire volume stays O(frontier out-edges).
    Path counts are int64-exact with an overflow guard (they grow
    ~deg^depth on dense graphs)."""

    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        self.part_size = part_size
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        if src.size and not bool(np.all(src[1:] >= src[:-1])):
            order = np.argsort(src, kind="stable")
            src, dst = src[order], dst[order]
        self.dst_sorted = dst
        self.indptr = np.searchsorted(src, np.arange(self.size + 1, dtype=np.int64))
        self.dist = np.full(self.size, -1, dtype=np.int64)
        self.sigma = np.zeros(self.size, dtype=np.int64)
        self.frontier = np.array([], dtype=np.int64)

    def seed(self, s: int) -> int:
        local = np.array([s - self.base], dtype=np.int64)
        local = local[(local >= 0) & (local < self.size)]
        self.dist[local] = 0
        self.sigma[local] = 1
        self.frontier = local
        return int(len(local))

    def reset(self) -> None:
        self.dist.fill(-1)
        self.sigma.fill(0)
        self.frontier = np.array([], dtype=np.int64)

    def _gather_neighbors(
        self, f: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(kept frontier rows, their out-degrees, concatenated dsts)
        — the CSR walk shared by the forward and backward sweeps."""
        if len(f) == 0:
            e = np.array([], dtype=np.int64)
            return e, e, e
        lens = self.indptr[f + 1] - self.indptr[f]
        m = lens > 0
        f, lens = f[m], lens[m]
        if len(f) == 0:
            e = np.array([], dtype=np.int64)
            return e, e, e
        starts = self.indptr[f]
        csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = (
            np.arange(int(lens.sum())) - np.repeat(csum, lens) + np.repeat(starts, lens)
        )
        return f, lens, self.dst_sorted[pos]

    def _route_by_owner(self, ids: np.ndarray, vals: np.ndarray) -> list:
        """Split (sorted ids, vals) into per-owner-shard plasma puts —
        the routed-exchange half shared by both sweeps."""
        owners = ids // self.part_size  # sorted, since ids is sorted
        uniq = np.unique(owners)
        bounds = np.searchsorted(owners, uniq, "left").tolist() + [len(ids)]
        return [
            (
                int(p),
                ray.put(
                    (ids[bounds[i] : bounds[i + 1]], vals[bounds[i] : bounds[i + 1]])
                ),
            )
            for i, p in enumerate(uniq)
        ]

    def expand(self) -> list:
        f, lens, dsts = self._gather_neighbors(self.frontier)
        if len(dsts) == 0:
            return []
        w = np.repeat(self.sigma[f], lens)
        ids, inv = np.unique(dsts, return_inverse=True)
        contribs = _exact_group_sum(inv, w, len(ids))
        return self._route_by_owner(ids, contribs)

    def absorb(self, refs: list, depth: int) -> int:
        got = [c for c in ray.get(list(refs)) if len(c[0])]
        if not got:
            self.frontier = np.array([], dtype=np.int64)
            return 0
        ids = np.concatenate([c[0] for c in got]) - self.base
        contribs = np.concatenate([c[1] for c in got])
        u, inv = np.unique(ids, return_inverse=True)
        sums = _exact_group_sum(inv, contribs, len(u))
        fresh_m = self.dist[u] < 0
        fresh = u[fresh_m]
        self.dist[fresh] = depth
        self.sigma[fresh] = sums[fresh_m]
        self.frontier = fresh
        return int(len(fresh))

    def rows(self, source: int):
        reached = np.nonzero(self.dist >= 0)[0]
        return pa.table(
            {
                "source": np.full(len(reached), source, dtype=np.int64),
                "vid": self.base + reached,
                "dist": self.dist[reached],
                "sigma": self.sigma[reached],
            }
        )


_SigmaShard = ray.remote(_SigmaShardBase)


def shortest_path_counts_bsp(
    graph: Graph,
    sources: list[int],
    directed: bool = False,
    num_parts: int | None = None,
    max_depth: int = 10_000,
    edges_canonical: bool = False,
    store: EdgeShardStore | None = None,
) -> SigmaRun:
    """Per-seed shortest-path counts (source, vid, dist, sigma) —
    Brandes' forward pass, the exact-integer core of betweenness
    centrality. One BFS-shaped sweep per seed over a shard pool built
    once; sigma is duplicate-SENSITIVE, so the undirected closure is
    built from the deduplicated simple graph. ``edges_canonical``
    certifies the input is already simple (undirected: src < dst,
    distinct, no self loops; directed: distinct pairs), skipping the
    dedup shuffle. A caller running several sweep queries over one
    graph passes a prebuilt ``store`` (MUST hold the matching simple
    closure) and skips the closure + shard shuffle entirely."""
    import ray.data as rd

    n = graph.n
    if n == 0 or not sources:
        return SigmaRun(counts=rd.from_items([]))
    src_list = [int(s) for s in sources]
    if min(src_list) < 0 or max(src_list) >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    if store is None:
        if directed:
            from parallel_pagerank_ray.pipelines.graph_build import dedup_edges

            simple = graph.edges if edges_canonical else dedup_edges(graph.edges)
        else:
            if edges_canonical:
                canon = graph.edges
            else:
                from parallel_pagerank_ray.pipelines.triangles import (
                    _simple_undirected,
                )

                canon = _simple_undirected(graph.edges)
            simple = undirected_edges(canon, dedup=False)
        if num_parts is None:
            # metadata-only upper bound (pre-dedup, doubled closure) —
            # num_parts is a parallelism knob, never a result knob;
            # never execute a lazy chain to size it
            ne = edge_count_hint(graph.edges)
            if ne is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                num_parts = cap_num_parts(min(256, max(4, cpus)), n)
            else:
                num_parts = sweep_num_parts(ne if directed else 2 * ne)
        store = EdgeShardStore.build(simple, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _SigmaShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    tables: list = []
    history: list[dict] = []
    for s in src_list:
        total = sum(ray.get([a.seed.remote(s) for a in actors]))
        it = 0
        while total and it < max_depth:
            it += 1
            routed = ray.get([a.expand.remote() for a in actors])
            inbox: list[list] = [[] for _ in range(P)]
            for row in routed:
                for p, ref in row:
                    inbox[p].append(ref)
            total = sum(
                ray.get([actors[p].absorb.remote(inbox[p], it) for p in range(P)])
            )
        tables.extend(a.rows.remote(s) for a in actors)
        history.append({"source": s, "iterations": max(it - 1, 0)})
        ray.get([a.reset.remote() for a in actors])
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return SigmaRun(counts=rd.from_arrow_refs(tables), history=history)


def closeness_centrality_bsp(
    graph: Graph,
    sources: list[int],
    directed: bool = False,
    num_parts: int | None = None,
    max_depth: int = 10_000,
    store: EdgeShardStore | None = None,
) -> ClosenessRun:
    """Per-seed closeness over ``graph`` (undirected closure by
    default, duplicate edges harmless — BFS is duplicate-invariant).

    Returns one row per source in input order: ``source, n_reached,
    sum_dist, ecc`` (int64-exact; ``ecc`` = eccentricity within the
    reachable set, 0 for isolated seeds — the max over a seed panel is
    the standard pseudo-diameter lower bound) and ``closeness`` (0.0
    for isolated seeds). The result is O(|sources|) rows — a
    driver-side table, not a Dataset.
    """
    n = graph.n
    if n == 0 or not sources:
        return ClosenessRun(
            table=pa.table(
                {
                    "source": pa.array([], type=pa.int64()),
                    "n_reached": pa.array([], type=pa.int64()),
                    "sum_dist": pa.array([], type=pa.int64()),
                    "ecc": pa.array([], type=pa.int64()),
                    "closeness": pa.array([], type=pa.float64()),
                }
            )
        )
    src_list = [int(s) for s in sources]
    if min(src_list) < 0 or max(src_list) >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    if store is None:
        if num_parts is None:
            ne = edge_count_hint(graph.edges)
            if ne is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                num_parts = cap_num_parts(min(256, max(4, cpus)), n)
            else:
                num_parts = sweep_num_parts(ne if directed else 2 * ne)
        edges = (
            graph.edges if directed else undirected_edges(graph.edges, dedup=False)
        )
        store = EdgeShardStore.build(edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _BFSShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    rows: list[tuple[int, int, int, int, float]] = []
    history: list[dict] = []
    for s in src_list:
        seed = np.array([s], dtype=np.int64)
        it, _ = _run_bfs_rounds(actors, P, seed, max_depth)
        parts = ray.get([a.stats.remote() for a in actors])
        r = sum(c for c, _, _ in parts)
        sum_d = sum(d for _, d, _ in parts)
        ecc = max(m for _, _, m in parts)  # 0 for isolated seeds
        if sum_d > 0:
            # (r-1)^2 / ((n-1)*sum_d): exact-int operands, one division
            closeness = ((r - 1.0) * (r - 1.0)) / ((n - 1.0) * float(sum_d))
        else:
            closeness = 0.0
        rows.append((s, r, sum_d, ecc, closeness))
        history.append({"source": s, "iterations": it, "reached": r})
        ray.get([a.reset.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    return ClosenessRun(
        table=pa.table(
            {
                "source": pa.array([r[0] for r in rows], type=pa.int64()),
                "n_reached": pa.array([r[1] for r in rows], type=pa.int64()),
                "sum_dist": pa.array([r[2] for r in rows], type=pa.int64()),
                "ecc": pa.array([r[3] for r in rows], type=pa.int64()),
                "closeness": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        ),
        history=history,
    )


def harmonic_centrality_bsp(
    graph: Graph,
    sources: list[int],
    directed: bool = False,
    num_parts: int | None = None,
    max_depth: int = 10_000,
    store: EdgeShardStore | None = None,
) -> pa.Table:
    """Per-seed harmonic centrality (Marchiori–Latora): one row per
    source — ``(source, n_reached, ecc, harmonic)`` with
    harmonic = sum over reached v != s of 1/d(s, v).

    Disconnection-robust where closeness is not (unreached vertices
    contribute 0 instead of poisoning the mean). Exactness: each shard
    ships an O(ecc) integer distance histogram; the driver merges them
    (integer adds) and folds cnt_d / d in ASCENDING-d order — each term
    is one IEEE division of exact-int operands and the fold is a strict
    sequential left fold, bit-matching DuckDB
    ``list_reduce(list(...) ORDER BY d)`` (the betweenness fold rule).
    """
    n = graph.n
    empty = pa.table(
        {
            "source": pa.array([], type=pa.int64()),
            "n_reached": pa.array([], type=pa.int64()),
            "ecc": pa.array([], type=pa.int64()),
            "harmonic": pa.array([], type=pa.float64()),
        }
    )
    if n == 0 or not sources:
        return empty
    src_list = [int(s) for s in sources]
    if min(src_list) < 0 or max(src_list) >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    if store is None:
        if num_parts is None:
            ne = edge_count_hint(graph.edges)
            if ne is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                num_parts = cap_num_parts(min(256, max(4, cpus)), n)
            else:
                num_parts = sweep_num_parts(ne if directed else 2 * ne)
        edges = (
            graph.edges if directed else undirected_edges(graph.edges, dedup=False)
        )
        store = EdgeShardStore.build(edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _BFSShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    rows: list[tuple[int, int, int, float]] = []
    for s in src_list:
        _run_bfs_rounds(actors, P, np.array([s], dtype=np.int64), max_depth)
        parts = ray.get([a.hist.remote() for a in actors])
        width = max((len(h) for h in parts), default=0)
        hist = np.zeros(width, dtype=np.int64)
        for h in parts:
            hist[: len(h)] += h
        harmonic = 0.0
        for d in range(1, width):  # ascending d — canonical fold order
            if hist[d]:
                harmonic = harmonic + float(hist[d]) / float(d)
        rows.append((s, int(hist.sum()), max(width - 1, 0), harmonic))
        ray.get([a.reset.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_reached": pa.array([r[1] for r in rows], type=pa.int64()),
            "ecc": pa.array([r[2] for r in rows], type=pa.int64()),
            "harmonic": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )


def pseudo_diameter_bsp(
    graph: Graph,
    start: int = 0,
    sweeps: int = 2,
    directed: bool = False,
    num_parts: int | None = None,
    store: EdgeShardStore | None = None,
) -> pa.Table:
    """Pseudo-diameter by iterated double sweep (Magnien–Latapy–Habib):
    BFS from ``start``, hop to the farthest reached vertex (max dist,
    tie-break min vid — a total order, SQL-reproducible), repeat
    ``sweeps`` times; the max eccentricity seen is a lower bound on the
    true diameter that is exact on trees and near-exact on web-ish
    graphs. One row: (start, peripheral, diameter_lb), all int64.

    Each hop reuses the same shard pool (the CSR build dominates); the
    farthest-vertex pick folds one (dist, vid) pair per shard — O(P)
    driver traffic per sweep."""
    n = graph.n
    if n == 0:
        return pa.table(
            {
                "start": pa.array([], type=pa.int64()),
                "peripheral": pa.array([], type=pa.int64()),
                "diameter_lb": pa.array([], type=pa.int64()),
            }
        )
    if not 0 <= start < n:
        raise ValueError(f"start vid out of range [0, {n})")
    if store is None:
        if num_parts is None:
            ne = edge_count_hint(graph.edges)
            if ne is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                num_parts = cap_num_parts(min(256, max(4, cpus)), n)
            else:
                num_parts = sweep_num_parts(ne if directed else 2 * ne)
        edges = (
            graph.edges if directed else undirected_edges(graph.edges, dedup=False)
        )
        store = EdgeShardStore.build(edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _BFSShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    cur = int(start)
    best = 0
    peripheral = cur
    for _ in range(max(1, sweeps)):
        _run_bfs_rounds(actors, P, np.array([cur], dtype=np.int64), 10_000)
        parts = ray.get([a.far_vertex.remote() for a in actors])
        ecc, far = max(
            ((d, -v) for d, v in parts if v >= 0), default=(0, -cur)
        )
        far = -far
        if ecc > best:
            best, peripheral = int(ecc), int(far)
        ray.get([a.reset.remote() for a in actors])
        if far == cur or ecc == 0:
            break
        cur = far
    for a in actors:
        ray.kill(a)
    return pa.table(
        {
            "start": pa.array([int(start)], type=pa.int64()),
            "peripheral": pa.array([peripheral], type=pa.int64()),
            "diameter_lb": pa.array([best], type=pa.int64()),
        }
    )


@dataclass
class BetweennessRun:
    scores: "object"  # Dataset (vid, btw) — nonzero dependency sums
    history: list[dict] = field(default_factory=list)


def seq_group_sum(vals: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Strict LEFT-TO-RIGHT float64 fold per contiguous segment —
    ((v0+v1)+v2)+... exactly. np.add.reduce/reduceat use pairwise
    (blocked) summation, so they canNOT serve here: the engine's
    betweenness gate reproduces this fold in SQL via
    list_reduce(list(x ORDER BY ...)), which is a strict left fold, and
    the two must agree bitwise. Vectorized as a ragged-column sweep:
    pass k adds element k of every still-active segment, so the loop
    runs max(lens) times over a shrinking index set — O(total elements)
    adds, with per-pass overhead bounded by the largest in-level degree
    (fine even for web hubs: one numpy op per depth-of-hub)."""
    out = vals[starts].copy() if len(starts) else np.array([], dtype=np.float64)
    if len(starts) == 0:
        return out
    idx = np.arange(len(starts))
    act_starts, act_lens = starts, lens
    for k in range(1, int(lens.max(initial=0))):
        m = act_lens > k
        if not m.all():
            idx, act_starts, act_lens = idx[m], act_starts[m], act_lens[m]
        if len(idx) == 0:
            break
        out[idx] += vals[act_starts + k]
    return out


class _BrandesShardBase(_SigmaShardBase):
    """Sigma shard + Brandes' backward dependency pass. The undirected
    closure makes the forward CSR its own reverse adjacency, so the
    backward pass reuses it: level-d vertices send per-edge terms
    term(w) = (1 + delta(w)) / sigma(w) to their neighbors, and each
    owner computes delta(u) = sigma(u) * fold(terms) for the u's at
    level d-1 (the predecessor filter happens owner-side where dist(u)
    is known). The fold is a strict sequential sum over senders w in
    GLOBALLY ASCENDING vid order — shards own contiguous vid ranges and
    emit (dst, w)-sorted pairs, so concatenating inboxes in shard order
    and stable-sorting by dst recovers the global (dst, w) order with
    no extra wire data. That makes the float64 dependency sums
    bit-reproducible at ANY partitioning and SQL-expressible
    (list_reduce over an ORDER BY w list), which is what turns the
    betweenness driver gate value-exact. Wire cost is per-edge instead
    of per-unique-dst — still O(level out-edges), the same order as the
    forward scatter."""

    def bwd_init(self) -> int:
        self.delta = np.zeros(self.size, dtype=np.float64)
        if not hasattr(self, "btw"):
            self.btw = np.zeros(self.size, dtype=np.float64)
        # bucket local vertices by dist ONCE (one argsort) so each
        # backward level indexes its slice instead of rescanning the
        # whole dist array per level (O(n*ecc) on high-diameter graphs)
        self._by_dist = np.argsort(self.dist, kind="stable")
        self._dist_sorted = self.dist[self._by_dist]
        return int(self.dist.max(initial=-1))

    def bwd_expand(self, d: int) -> list:
        # _by_dist is a stable argsort, so the level slice f is already
        # ascending in local vid — pairs come out in (w, dst) order
        lo, hi = np.searchsorted(self._dist_sorted, [d, d + 1])
        f, lens, dsts = self._gather_neighbors(self._by_dist[lo:hi])
        if len(dsts) == 0:
            return []
        terms = np.repeat(
            (1.0 + self.delta[f]) / self.sigma[f].astype(np.float64), lens
        )
        # per-edge emission in (dst, w) order: stable sort by dst keeps
        # the ascending-w order within each dst
        order = np.argsort(dsts, kind="stable")
        return self._route_by_owner(dsts[order], terms[order])

    def bwd_absorb(self, refs: list, d: int) -> int:
        # refs arrive in ascending sender-shard order = ascending w
        # ranges; each payload is (dst, w)-sorted, so concat + stable
        # sort by dst yields the GLOBAL (dst, w) order — the canonical
        # fold order shared with the NumPy and SQL oracles
        got = [c for c in ray.get(list(refs)) if len(c[0])]
        if not got:
            return 0
        ids = np.concatenate([c[0] for c in got]) - self.base
        terms = np.concatenate([c[1] for c in got])
        order = np.argsort(ids, kind="stable")
        ids, terms = ids[order], terms[order]
        u, starts = np.unique(ids, return_index=True)
        lens = np.diff(np.append(starts, len(ids)))
        tsum = seq_group_sum(terms, starts, lens)
        m = self.dist[u] == d - 1  # predecessor filter
        sel = u[m]
        self.delta[sel] += self.sigma[sel].astype(np.float64) * tsum[m]
        return int(len(sel))

    def accumulate_and_reset(self, seed: int) -> None:
        """Fold this seed's dependencies into the running totals
        (excluding the seed itself, per Brandes) and clear sweep state."""
        local_seed = seed - self.base
        if 0 <= local_seed < self.size:
            self.delta[local_seed] = 0.0
        self.btw += self.delta
        self.reset()

    def btw_rows(self, half: bool):
        nz = np.nonzero(self.btw != 0.0)[0]
        vals = self.btw[nz]
        if half:
            vals = vals / 2.0
        return pa.table({"vid": self.base + nz, "btw": vals})


_BrandesShard = ray.remote(_BrandesShardBase)


def betweenness_bsp(
    graph: Graph,
    sources: list[int],
    num_parts: int | None = None,
    max_depth: int = 10_000,
    edges_canonical: bool = False,
    divide_pairs: bool = True,
    store: EdgeShardStore | None = None,
) -> BetweennessRun:
    """Brandes betweenness from a seed panel over the UNDIRECTED simple
    closure (sampled-source betweenness — the standard web-scale
    estimator; sources=all vertices gives the exact measure). Forward
    sigma sweep + backward dependency sweep per seed on one shard pool.
    ``divide_pairs`` halves the sums (each unordered pair is counted
    from both endpoints when the seed panel covers them — the standard
    undirected convention)."""
    import ray.data as rd

    n = graph.n
    if n == 0 or not sources:
        return BetweennessRun(scores=rd.from_items([]))
    src_list = [int(s) for s in sources]
    if min(src_list) < 0 or max(src_list) >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    if store is None:
        if edges_canonical:
            canon = graph.edges
        else:
            from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

            canon = _simple_undirected(graph.edges)
        simple = undirected_edges(canon, dedup=False)
        if num_parts is None:
            ne = edge_count_hint(graph.edges)
            if ne is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                num_parts = cap_num_parts(min(256, max(4, cpus)), n)
            else:
                num_parts = sweep_num_parts(2 * ne)
        store = EdgeShardStore.build(simple, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _BrandesShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    history: list[dict] = []
    for s in src_list:
        total = sum(ray.get([a.seed.remote(s) for a in actors]))
        it = 0
        while total and it < max_depth:
            it += 1
            routed = ray.get([a.expand.remote() for a in actors])
            inbox: list[list] = [[] for _ in range(P)]
            for row in routed:
                for p, ref in row:
                    inbox[p].append(ref)
            total = sum(
                ray.get([actors[p].absorb.remote(inbox[p], it) for p in range(P)])
            )
        maxd = max(ray.get([a.bwd_init.remote() for a in actors]))
        for d in range(maxd, 0, -1):
            routed = ray.get([a.bwd_expand.remote(d) for a in actors])
            inbox = [[] for _ in range(P)]
            for row in routed:
                for p, ref in row:
                    inbox[p].append(ref)
            ray.get([actors[p].bwd_absorb.remote(inbox[p], d) for p in range(P)])
        ray.get([a.accumulate_and_reset.remote(s) for a in actors])
        history.append({"source": s, "levels": maxd})
    tables = [a.btw_rows.remote(divide_pairs) for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return BetweennessRun(scores=rd.from_arrow_refs(tables), history=history)


class _EdgeBrandesShardBase(_BrandesShardBase):
    """Brandes shard that ALSO accumulates per-EDGE dependencies
    (Girvan-Newman edge betweenness). The backward exchange carries the
    sender id w alongside each term, the receiving owner u charges the
    DAG edge (u, w) with sigma(u) * term — exactly one contribution per
    (seed, directed edge), accumulated in seed order into the edge's
    CSR slot, so every per-edge float64 sum is a strict left fold over
    ascending seed index (the SQL-replayable order). The vertex deltas
    are computed by the identical canonical fold as the base class, so
    vertex betweenness from this shard is bit-identical to
    ``_BrandesShardBase``.

    Slot lookup packs (u, w) as u * n + w (requires n < 3e9 — the
    linkpred packed-key contract); adjacency is re-sorted by (src, dst)
    once in __init__ so the packed keys are globally sorted and the
    lookup is one searchsorted. The re-sort is safe: both sweeps order
    their emissions explicitly (np.unique / stable argsort by dst)."""

    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        super().__init__(part, part_refs, n, part_size)
        if n > 3_000_000_000:  # pragma: no cover - packed slot key
            raise ValueError("edge betweenness packed slots need n < 3e9")
        self.n = n
        if len(self.dst_sorted):
            src_exp = np.repeat(
                np.arange(self.size, dtype=np.int64),
                np.diff(self.indptr),
            )
            order = np.lexsort((self.dst_sorted, src_exp))
            self.dst_sorted = self.dst_sorted[order]
            self._packed = (self.base + src_exp[order]) * np.int64(n) + self.dst_sorted
        else:
            self._packed = np.array([], dtype=np.int64)
        self.ebtw = np.zeros(len(self.dst_sorted), dtype=np.float64)

    def bwd_expand(self, d: int) -> list:
        lo, hi = np.searchsorted(self._dist_sorted, [d, d + 1])
        f, lens, dsts = self._gather_neighbors(self._by_dist[lo:hi])
        if len(dsts) == 0:
            return []
        wids = self.base + np.repeat(f, lens)
        terms = np.repeat(
            (1.0 + self.delta[f]) / self.sigma[f].astype(np.float64), lens
        )
        order = np.argsort(dsts, kind="stable")
        dsts, wids, terms = dsts[order], wids[order], terms[order]
        owners = dsts // self.part_size
        uniq = np.unique(owners)
        bounds = np.searchsorted(owners, uniq, "left").tolist() + [len(dsts)]
        return [
            (
                int(p),
                ray.put(
                    (
                        dsts[bounds[i] : bounds[i + 1]],
                        wids[bounds[i] : bounds[i + 1]],
                        terms[bounds[i] : bounds[i + 1]],
                    )
                ),
            )
            for i, p in enumerate(uniq)
        ]

    def bwd_absorb(self, refs: list, d: int) -> int:
        got = [c for c in ray.get(list(refs)) if len(c[0])]
        if not got:
            return 0
        ids = np.concatenate([c[0] for c in got]) - self.base
        wids = np.concatenate([c[1] for c in got])
        terms = np.concatenate([c[2] for c in got])
        order = np.argsort(ids, kind="stable")
        ids, wids, terms = ids[order], wids[order], terms[order]
        u, starts = np.unique(ids, return_index=True)
        lens = np.diff(np.append(starts, len(ids)))
        tsum = seq_group_sum(terms, starts, lens)
        m = self.dist[u] == d - 1  # predecessor filter
        sel = u[m]
        self.delta[sel] += self.sigma[sel].astype(np.float64) * tsum[m]
        # per-edge charge: one row per (seed, DAG edge) — slot add order
        # within a seed touches distinct slots, across seeds it is the
        # sequential seed loop, so each slot is a left fold over seeds
        pred = self.dist[ids] == d - 1
        if pred.any():
            pu, pw, pt = ids[pred], wids[pred], terms[pred]
            contrib = self.sigma[pu].astype(np.float64) * pt
            slots = np.searchsorted(
                self._packed, (self.base + pu) * np.int64(self.n) + pw
            )
            self.ebtw[slots] += contrib
        return int(len(sel))

    def edge_rows(self):
        nz = np.nonzero(self.ebtw != 0.0)[0]
        if not len(nz):
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                }
            )
        keys = self._packed[nz]
        return pa.table(
            {
                "u": pa.array(keys // np.int64(self.n), pa.int64()),
                "w": pa.array(keys % np.int64(self.n), pa.int64()),
                "v": pa.array(self.ebtw[nz], pa.float64()),
            }
        )


_EdgeBrandesShard = ray.remote(_EdgeBrandesShardBase)


def edge_betweenness_bsp(
    graph: Graph,
    sources: list[int],
    num_parts: int | None = None,
    max_depth: int = 10_000,
    edges_canonical: bool = False,
    divide_pairs: bool = True,
    store: EdgeShardStore | None = None,
) -> "rd.Dataset":
    """Girvan-Newman edge betweenness from a seed panel over the
    undirected simple closure. Output one row per canonical edge with a
    nonzero score: (src, dst, ebtw) with src < dst and

        ebtw = (fold_fwd + fold_rev) / 2      (divide_pairs)

    where fold_fwd / fold_rev are the strict seed-ordered left folds of
    the per-seed contributions charged in the (src -> dst) /
    (dst -> src) DAG direction — every float64 operation is a fixed
    canonical order, so the result is bit-reproducible at any
    partitioning and a DuckDB oracle replays it with list_reduce.

    Same harness / cost as ``betweenness_bsp`` (one forward sigma sweep
    + one backward dependency sweep per seed); the only extra wire data
    is the 8-byte sender id per backward term.
    """
    import ray.data as rd

    n = graph.n
    if n == 0 or not sources:
        return rd.from_items([])
    src_list = [int(s) for s in sources]
    if min(src_list) < 0 or max(src_list) >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    if store is None:
        if edges_canonical:
            canon = graph.edges
        else:
            from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

            canon = _simple_undirected(graph.edges)
        simple = undirected_edges(canon, dedup=False)
        if num_parts is None:
            ne = edge_count_hint(graph.edges)
            if ne is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                num_parts = cap_num_parts(min(256, max(4, cpus)), n)
            else:
                num_parts = sweep_num_parts(2 * ne)
        store = EdgeShardStore.build(simple, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _EdgeBrandesShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    for s in src_list:
        total = sum(ray.get([a.seed.remote(s) for a in actors]))
        it = 0
        while total and it < max_depth:
            it += 1
            routed = ray.get([a.expand.remote() for a in actors])
            inbox: list[list] = [[] for _ in range(P)]
            for row in routed:
                for p, ref in row:
                    inbox[p].append(ref)
            total = sum(
                ray.get([actors[p].absorb.remote(inbox[p], it) for p in range(P)])
            )
        maxd = max(ray.get([a.bwd_init.remote() for a in actors]))
        for d in range(maxd, 0, -1):
            routed = ray.get([a.bwd_expand.remote(d) for a in actors])
            inbox = [[] for _ in range(P)]
            for row in routed:
                for p, ref in row:
                    inbox[p].append(ref)
            ray.get([actors[p].bwd_absorb.remote(inbox[p], d) for p in range(P)])
        ray.get([a.reset.remote() for a in actors])
    tables = [a.edge_rows.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    directed = rd.from_arrow_refs(tables)

    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import drop_empty_blocks

    def canon_rows(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        fwd = u < w
        return pa.table(
            {
                "src": pa.array(np.minimum(u, w), pa.int64()),
                "dst": pa.array(np.maximum(u, w), pa.int64()),
                "vf": pa.array(np.where(fwd, v, 0.0), pa.float64()),
                "vr": pa.array(np.where(fwd, 0.0, v), pa.float64()),
            }
        )

    per_edge = grouped_agg(
        drop_empty_blocks(directed).map_batches(
            canon_rows, batch_format="pyarrow"
        ),
        ["src", "dst"],
        {"vf": ("vf", "sum"), "vr": ("vr", "sum")},
    )

    half = 2.0 if divide_pairs else 1.0

    def finish(t: pa.Table) -> pa.Table:
        vf = t.column("vf").to_numpy(zero_copy_only=False)
        vr = t.column("vr").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "ebtw": pa.array((vf + vr) / half, pa.float64()),
            }
        )

    return per_edge.map_batches(finish, batch_format="pyarrow")
