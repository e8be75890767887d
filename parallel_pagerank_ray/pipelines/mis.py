"""Maximal independent set — deterministic Luby rounds (Luby 1986).

Beyond-reference capability (the reference computes no vertex
selections; closest surface is PageRank's per-vertex loop at
/root/reference/pagerank_mpi/pagerank_mpi.c:132-231). The classic
parallel symmetry-breaking primitive over the simple undirected
closure:

    priority  key(v) = ((A*v + B) mod 2^31-1) * 2^31 + v
              — a pure function of the vid, SQL-safe (every product
              < 2^62) and a TOTAL order (the +v low bits break hash
              collisions), so no randomness is exchanged and every
              engine/oracle reproduces the exact same set
    round     every alive vertex whose key is a strict local minimum
              among its alive neighbors joins the MIS; winners and
              their neighbors leave the alive set

Synchronous rounds with a total-order priority make the result exact
and parallelism-independent; the globally minimum alive vertex always
wins, so every round makes progress and the loop terminates in
O(log n) expected rounds on random-looking priorities.

BSP shape (the kcore peeling harness, pipelines/kcore.py): each shard
holds the closure edges of its vertex range sorted by (src, key(dst)),
so "min alive neighbor key" is the FIRST alive edge of the vertex's
range — a per-vertex cursor that only advances (edges only die), O(E)
total cursor work across all rounds. Edge deaths arrive as the sorted
newly-dead id list (one ray.put per round, zero-copy read per shard;
ids sum to <= n over the run — no dense vector exchange anywhere).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus

# SQL-reproducible priority params (functions/hashing.py policy: all
# products < 2^62 in both numpy int64 and DuckDB BIGINT)
MIS_A = 1_000_033
MIS_B = 777
_P31 = (1 << 31) - 1


def mis_key(vid: np.ndarray) -> np.ndarray:
    """Total-order priority key, int64: hash high bits, vid low bits."""
    v = np.asarray(vid, dtype=np.int64)
    return ((MIS_A * v + MIS_B) % _P31) * (1 << 31) + v


@dataclass
class MISRun:
    members: rd.Dataset  # (vid,) the maximal independent set
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _MISShard:
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
        key = mis_key(dst)
        order = np.lexsort((key, src))
        self.src = src[order]
        self.dst = dst[order]
        self.dst_key = key[order]
        # per local vertex: [start, end) range in the (src, key)-sorted
        # edge array; cursor starts at start and only advances
        idx = np.arange(self.size, dtype=np.int64)
        self.start = np.searchsorted(self.src, idx, "left")
        self.end = np.searchsorted(self.src, idx, "right")
        self.ptr = self.start.copy()
        self.edge_alive = np.ones(len(self.src), dtype=bool)
        # dst-sorted view for marking edge deaths (positions into the
        # src-sorted arrays); each edge dies at most once over the run
        self.dst_order = np.argsort(self.dst, kind="stable")
        self.dst_sorted = self.dst[self.dst_order]
        self.alive = np.ones(self.size, dtype=bool)
        self.mis = np.zeros(self.size, dtype=bool)
        self.my_key = mis_key(self.base + idx)

    def winners(self) -> np.ndarray:
        """Global ids of alive local vertices whose key is a strict
        minimum among alive neighbors (no alive neighbor also wins).
        Cursor advancement is vectorized and amortized O(E) total."""
        cand = np.nonzero(self.alive)[0]
        # advance candidate cursors past dead edges: each pass moves
        # only cursors sitting on a dead edge, so total passes' work
        # telescopes to O(edges died) across the whole run
        if len(self.src):
            active = cand[self.ptr[cand] < self.end[cand]]
            while len(active):
                adv = active[~self.edge_alive[self.ptr[active]]]
                if not len(adv):
                    break
                self.ptr[adv] += 1
                active = adv[self.ptr[adv] < self.end[adv]]
        has = self.ptr[cand] < self.end[cand]
        win = ~has
        if has.any():
            c = cand[has]
            win_has = self.my_key[c] < self.dst_key[self.ptr[c]]
            win[has] = win_has
        return (self.base + cand[win]).astype(np.int64)

    def apply_winners(self, winners: np.ndarray) -> np.ndarray:
        """Mark local winners as MIS members; kill their local
        neighbors. Returns newly-dead local ids (winners + neighbors)
        for the global edge-death broadcast. ``winners`` is the sorted
        global winner list."""
        lo = np.searchsorted(winners, self.base)
        hi = np.searchsorted(winners, self.base + self.size)
        local_w = winners[lo:hi] - self.base
        self.mis[local_w] = True
        self.alive[local_w] = False
        # neighbors: local srcs of edges pointing at any winner
        a = np.searchsorted(self.dst_sorted, winners, "left")
        b = np.searchsorted(self.dst_sorted, winners, "right")
        lens = b - a
        m = lens > 0
        dead_n = np.array([], dtype=np.int64)
        if m.any():
            a, lens = a[m], lens[m]
            csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos = (
                np.arange(int(lens.sum()))
                - np.repeat(csum, lens)
                + np.repeat(a, lens)
            )
            srcs = self.src[self.dst_order[pos]]
            srcs = srcs[self.alive[srcs]]
            self.alive[srcs] = False
            dead_n = np.unique(srcs)
        out = np.concatenate((local_w, dead_n))
        out.sort()
        return (self.base + out).astype(np.int64)

    def kill_edges(self, dead: np.ndarray) -> int:
        """Mark every edge pointing at a newly-dead vertex as dead.
        ``dead`` is the sorted global newly-dead list."""
        a = np.searchsorted(self.dst_sorted, dead, "left")
        b = np.searchsorted(self.dst_sorted, dead, "right")
        lens = b - a
        m = lens > 0
        if m.any():
            a, lens = a[m], lens[m]
            csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos = (
                np.arange(int(lens.sum()))
                - np.repeat(csum, lens)
                + np.repeat(a, lens)
            )
            self.edge_alive[self.dst_order[pos]] = False
        return int(self.alive.sum())

    def slice_table(self):
        import pyarrow as pa

        vids = self.base + np.nonzero(self.mis)[0]
        return pa.table({"vid": vids.astype(np.int64)})


def mis_bsp(
    graph: Graph, num_parts: int | None = None, edges_canonical: bool = False
) -> MISRun:
    """Deterministic Luby MIS of the simple undirected closure of
    ``graph.edges``. ``edges_canonical=True`` certifies src < dst,
    globally distinct, no self loops (skips the closure dedup — the
    strict-minimum rule needs each neighbor seen, duplicates are
    harmless but cost memory, self-loops would deadlock a vertex).

    Shard state is O(E_p + size); per-round traffic is the winner and
    newly-dead id lists (<= 2n ids over the whole run).
    """
    n = graph.n
    if n == 0:
        return MISRun(members=rd.from_items([]), iterations=0)
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    if edges_canonical:
        canon = graph.edges
    else:
        from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

        canon = _simple_undirected(graph.edges)
    und = undirected_edges(canon, dedup=False)
    store = EdgeShardStore.build(und, n=n, num_parts=num_parts)
    del und, canon
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _MISShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    it = 0
    history: list[dict] = []
    try:
        while True:
            parts = ray.get([a.winners.remote() for a in actors])
            winners = np.concatenate(parts)
            if not len(winners):
                break
            winners.sort()
            wref = ray.put(winners)
            dead_parts = ray.get([a.apply_winners.remote(wref) for a in actors])
            dead = np.concatenate(dead_parts)
            dead.sort()
            dref = ray.put(dead)
            alive = sum(ray.get([a.kill_edges.remote(dref) for a in actors]))
            it += 1
            history.append(
                {"iter": it, "winners": int(len(winners)), "alive": int(alive)}
            )
        tables = [a.slice_table.remote() for a in actors]
        ray.wait(tables, num_returns=len(tables))
    finally:
        for a in actors:
            ray.kill(a)
    return MISRun(
        members=rd.from_arrow_refs(tables), iterations=it, history=history
    )
