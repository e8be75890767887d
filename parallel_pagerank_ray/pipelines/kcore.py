"""k-core decomposition: maximal subgraph where every vertex has at
least k neighbors (simple undirected graph).

Beyond-reference capability (the reference computes no subgraph
decompositions; its only degree use is the PageRank out-degree at
/root/reference/pagerank_mpi/pagerank_mpi.c:179). Parallel peeling on
the BSP actor harness (same shape as components_actors.py):

    init    each shard holds the closure edges of its vertex range,
            indexed BOTH ways (CSR by local src for the kill rule is
            implicit in a bincount; sorted by global dst for the
            decrement lookup); local degree = one bincount
    round   driver broadcasts last round's newly-killed vertex ids
            (ONE ray.put, every shard reads zero-copy); each shard
            looks up the edge ranges pointing AT killed vertices
            (searchsorted into the dst-sorted index), decrements the
            local degrees of their sources, kills local vertices that
            fell below k, returns their global ids

Every edge's destination dies at most once, so the decrement touches
each edge at most once across ALL rounds: total work is O(E log E)
for the one-time dst sort + O(E) decrements, and per-round traffic is
only the newly-killed id list (sums to <= n ids over the whole run —
no dense vector exchange at all). Round count equals the peeling
depth (worst case O(n) on a path with k=2; real link graphs peel in
tens of rounds).

Integer degrees + simultaneous-kill rounds make the result exact and
parallelism-independent: a round kills exactly the vertices whose
degree among CURRENTLY-alive vertices is < k, which is the classic
synchronous peeling fixpoint — the same set the sequential algorithm
removes, in any order. Matches ``oracle.kcore``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus


@dataclass
class KCoreRun:
    members: rd.Dataset  # (vid,) vertices of the k-core, may be empty
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _KCoreShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int, k: int) -> None:
        self.k = k
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        # degree of local vertices over the closure = one bincount (the
        # closure gives every shard ALL edges incident to its range;
        # bincount is order-independent, so src need not be sorted)
        self.deg = np.bincount(src, minlength=self.size).astype(np.int64)
        # dst-sorted edge index: for a killed global vertex v, the edges
        # pointing at v are one searchsorted range; their sources lose a
        # degree. Each dst dies at most once -> each edge is touched at
        # most once over the whole run. The store is built with
        # sort_by="dst", so chunks arrive already dst-sorted — argsort
        # only as a defense against unordered refs.
        if dst.size and not bool(np.all(dst[1:] >= dst[:-1])):
            order = np.argsort(dst, kind="stable")
            dst = dst[order]
            src = src[order]
        self.dst_sorted = dst
        self.src_for_dst = src
        self.alive = np.ones(self.size, dtype=bool)

    def initial_kill(self):
        """Vertices already below k before any peeling."""
        doomed = np.nonzero(self.alive & (self.deg < self.k))[0]
        self.alive[doomed] = False
        return self.base + doomed

    def peel(self, killed: np.ndarray) -> np.ndarray:
        """Apply one round of remote deaths; return local vertices that
        fell below k (their global ids). ``killed`` is passed as a
        top-level ObjectRef (one plasma copy, auto-dereferenced as a
        zero-copy read in every shard)."""
        if len(killed):
            lo = np.searchsorted(self.dst_sorted, killed, "left")
            hi = np.searchsorted(self.dst_sorted, killed, "right")
            lens = hi - lo
            m = lens > 0
            if m.any():
                lo, lens = lo[m], lens[m]
                csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
                pos = (
                    np.arange(int(lens.sum()))
                    - np.repeat(csum, lens)
                    + np.repeat(lo, lens)
                )
                np.subtract.at(self.deg, self.src_for_dst[pos], 1)
        doomed = np.nonzero(self.alive & (self.deg < self.k))[0]
        self.alive[doomed] = False
        return self.base + doomed

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.nonzero(self.alive)[0]
        return pa.table({"vid": vids})


def kcore_bsp(
    graph: Graph,
    k: int,
    num_parts: int | None = None,
    edges_canonical: bool = False,
) -> KCoreRun:
    """k-core members of the simple undirected closure of
    ``graph.edges``. ``edges_canonical=True`` certifies the input is
    already undirected-canonical (src < dst, globally distinct, no
    self loops), skipping the closure dedup shuffle — degree counting
    REQUIRES a simple graph, so non-canonical inputs pay the dedup.

    Shard state is O(E_p + size) — no full-n vectors anywhere, so the
    engine scales to any vertex count the shards' edge slices fit.
    """
    n = graph.n
    if n == 0 or k <= 0:
        return KCoreRun(members=rd.from_items([]), iterations=0)
    if num_parts is None:
        # no dense exchange anywhere -> shards are cheap; one per CPU
        # quarters the per-shard init (the dst argsort dominates the
        # whole run at 10M vertices) instead of the cpus//4 the
        # dense-exchange engines use to bound per-superstep traffic
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    if edges_canonical:
        canon = graph.edges
    else:
        # dedup the CANONICAL half-sized table, then close symmetrically
        # dedup-free (the closure of a canonical set has no duplicates)
        # — half the dedup shuffle volume of deduping the closure
        from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

        canon = _simple_undirected(graph.edges)
    und = undirected_edges(canon, dedup=False)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts, sort_by="dst")
    del und, canon  # release closure blocks before shard init reads the store
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _KCoreShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size, k
        )
        for p in range(P)
    ]
    killed_parts = ray.get([a.initial_kill.remote() for a in actors])
    newly_killed = np.concatenate(killed_parts) if killed_parts else np.array([], dtype=np.int64)
    it = 0
    history: list[dict] = [{"iter": 0, "killed": int(len(newly_killed))}]
    while len(newly_killed):
        newly_killed.sort()  # searchsorted targets in peel()
        ref = ray.put(newly_killed)
        parts = ray.get([a.peel.remote(ref) for a in actors])
        newly_killed = np.concatenate(parts)
        it += 1
        history.append({"iter": it, "killed": int(len(newly_killed))})
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return KCoreRun(
        members=rd.from_arrow_refs(tables), iterations=it, history=history
    )


@ray.remote
class _CorenessShard:
    """_KCoreShard with a RISING threshold: vertices dying while the
    threshold is k receive coreness k-1. Same O(E_p + size) state and
    each-edge-touched-once peeling; only the threshold bookkeeping and
    the (vid, coreness) output differ."""

    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        self.deg = np.bincount(src, minlength=self.size).astype(np.int64)
        if dst.size and not bool(np.all(dst[1:] >= dst[:-1])):
            order = np.argsort(dst, kind="stable")
            dst = dst[order]
            src = src[order]
        self.dst_sorted = dst
        self.src_for_dst = src
        self.alive = np.ones(self.size, dtype=bool)
        self.core = np.zeros(self.size, dtype=np.int64)
        self.k = 0

    def raise_k(self, k: int):
        """Adopt threshold k; return local vertices now below it."""
        self.k = k
        doomed = np.nonzero(self.alive & (self.deg < k))[0]
        self.alive[doomed] = False
        self.core[doomed] = k - 1
        return self.base + doomed

    def alive_count(self) -> int:
        return int(self.alive.sum())

    def peel(self, killed: np.ndarray):
        if len(killed):
            lo = np.searchsorted(self.dst_sorted, killed, "left")
            hi = np.searchsorted(self.dst_sorted, killed, "right")
            lens = hi - lo
            m = lens > 0
            if m.any():
                lo, lens = lo[m], lens[m]
                csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
                pos = (
                    np.arange(int(lens.sum()))
                    - np.repeat(csum, lens)
                    + np.repeat(lo, lens)
                )
                np.subtract.at(self.deg, self.src_for_dst[pos], 1)
        doomed = np.nonzero(self.alive & (self.deg < self.k))[0]
        self.alive[doomed] = False
        self.core[doomed] = self.k - 1
        return self.base + doomed

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.arange(self.size, dtype=np.int64)
        return pa.table(
            {
                "vid": pa.array(vids, pa.int64()),
                "coreness": pa.array(self.core, pa.int64()),
            }
        )


def coreness_bsp(
    graph: Graph,
    num_parts: int | None = None,
    edges_canonical: bool = False,
) -> KCoreRun:
    """Full core decomposition: (vid, coreness) for every vertex of
    the simple undirected closure — coreness(v) = the largest k with v
    in the k-core. One peeling pass with a rising threshold: peel to
    the fixpoint at k, then k += 1, until no vertex survives. Total
    work stays O(E) for the degree updates (each edge's death is
    processed once) plus one O(size) scan per threshold step; the
    threshold rises at most (max coreness + 1) times."""
    n = graph.n
    if n == 0:
        return KCoreRun(members=rd.from_items([]), iterations=0)
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    if edges_canonical:
        canon = graph.edges
    else:
        from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

        canon = _simple_undirected(graph.edges)
    und = undirected_edges(canon, dedup=False)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts, sort_by="dst")
    del und, canon
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _CorenessShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    it = 0
    k = 0
    history: list[dict] = []
    while True:
        k += 1
        killed_parts = ray.get([a.raise_k.remote(k) for a in actors])
        newly_killed = (
            np.concatenate(killed_parts)
            if killed_parts
            else np.array([], dtype=np.int64)
        )
        history.append({"iter": it, "k": k, "killed": int(len(newly_killed))})
        while len(newly_killed):
            newly_killed.sort()
            ref = ray.put(newly_killed)
            parts = ray.get([a.peel.remote(ref) for a in actors])
            newly_killed = np.concatenate(parts)
            it += 1
            history.append(
                {"iter": it, "k": k, "killed": int(len(newly_killed))}
            )
        if sum(ray.get([a.alive_count.remote() for a in actors])) == 0:
            break
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return KCoreRun(
        members=rd.from_arrow_refs(tables), iterations=it, history=history
    )
