"""Weighted single/multi-source shortest paths on the BSP harness.

Beyond-reference capability: the weighted companion to pipelines/bfs
(the reference has no path algorithms at all). Frontier-relaxation
Bellman-Ford, the standard Pregel SSSP:

    expand  each shard relaxes ONLY the edges of vertices whose
            distance improved last round, pre-combines candidates per
            destination (one min per dst), and routes them to the
            owner shard — same routed exchange as BFS (an unrouted
            broadcast is O(P x total) and was measured pathological)
    absorb  owners keep the minimum of current and candidate
            distances; improved vertices form the next local frontier

Positive INTEGER weights keep every distance exact (min over int64 is
order-independent -> identical at any parallelism); rounds are
bounded by the maximum hop count of any shortest path. Shard state is
O(E_p + size) — no full-n vectors. Matches ``oracle.sssp_weighted``
(Dijkstra).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus

_INF = np.iinfo(np.int64).max


@dataclass
class SSSPRun:
    distances: rd.Dataset  # (vid, dist) for REACHED vertices only
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _SSSPShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int) -> None:
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        self.part_size = part_size
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
            if len(chunks[0]) < 3:
                raise ValueError("SSSP needs a weighted edge store (w column)")
            from parallel_pagerank_ray.stages.csr_store import int_weights

            w = int_weights(np.concatenate([c[2] for c in chunks]))
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
            w = np.array([], dtype=np.int64)
        # local CSR by src (store delivers src-sorted chunks)
        if src.size and not bool(np.all(src[1:] >= src[:-1])):
            order = np.argsort(src, kind="stable")
            src, dst, w = src[order], dst[order], w[order]
        self.dst_sorted = dst
        self.w_sorted = w
        self.indptr = np.searchsorted(src, np.arange(self.size + 1, dtype=np.int64))
        self.dist = np.full(self.size, _INF, dtype=np.int64)
        self.frontier = np.array([], dtype=np.int64)  # local indices

    def seed(self, sources: np.ndarray) -> int:
        local = sources[(sources >= self.base) & (sources < self.base + self.size)]
        local = local - self.base
        self.dist[local] = 0
        self.frontier = local
        return int(len(local))

    def expand(self) -> list:
        """Relaxation candidates (dst, cand_dist) of the local
        frontier, min-combined per dst and ROUTED by owner shard."""
        f = self.frontier
        if len(f) == 0:
            return []
        lens = self.indptr[f + 1] - self.indptr[f]
        m = lens > 0
        f, lens = f[m], lens[m]
        if len(f) == 0:
            return []
        starts = self.indptr[f]
        csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(int(lens.sum())) - np.repeat(csum, lens) + np.repeat(starts, lens)
        cand_d = np.repeat(self.dist[f], lens) + self.w_sorted[pos]
        cand_v = self.dst_sorted[pos]
        # local min-combine per destination
        ids, inv = np.unique(cand_v, return_inverse=True)
        best = np.full(len(ids), _INF, dtype=np.int64)
        np.minimum.at(best, inv, cand_d)
        owners = ids // self.part_size  # sorted (ids is sorted)
        uniq = np.unique(owners)
        bounds = np.searchsorted(owners, uniq, "left").tolist() + [len(ids)]
        return [
            (int(p), ray.put((ids[bounds[i] : bounds[i + 1]],
                              best[bounds[i] : bounds[i + 1]])))
            for i, p in enumerate(uniq)
        ]

    def absorb(self, refs: list) -> int:
        """Keep the min of current and candidate distances; improved
        vertices form the next frontier. Returns the improvement count."""
        pairs = [p for p in ray.get(list(refs)) if len(p[0])]
        if not pairs:
            self.frontier = np.array([], dtype=np.int64)
            return 0
        ids = np.concatenate([p[0] for p in pairs]) - self.base
        vals = np.concatenate([p[1] for p in pairs])
        cur = self.dist.copy()
        np.minimum.at(self.dist, ids, vals)
        improved = np.nonzero(self.dist < cur)[0]
        self.frontier = improved
        return int(len(improved))

    def slice_table(self):
        import pyarrow as pa

        reached = np.nonzero(self.dist < _INF)[0]
        return pa.table(
            {"vid": self.base + reached, "dist": self.dist[reached]}
        )


def sssp_bsp(
    graph: Graph,
    sources: list[int],
    num_parts: int | None = None,
    max_rounds: int = 100_000,
) -> SSSPRun:
    """Shortest-path distances from ``sources`` over ``graph.edges``
    with its ``w`` column as positive integer edge lengths. The edge
    table is taken as-is (directed); pass a symmetric table for
    undirected semantics."""
    n = graph.n
    if n == 0 or not sources:
        return SSSPRun(distances=rd.from_items([]), iterations=0)
    src_arr = np.unique(np.asarray(sources, dtype=np.int64))
    if src_arr.min() < 0 or src_arr.max() >= n:
        raise ValueError(f"source vid out of range [0, {n})")
    try:
        names = graph.edges.schema().names
    except Exception:
        names = []
    if "w" not in (names or []):
        raise ValueError("SSSP needs a weighted edge table (w column); "
                         "for unweighted hops use bfs_distances_bsp")
    if num_parts is None:
        # sparse routed exchange -> shards are cheap, one per CPU
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    store = EdgeShardStore.build(graph.edges, n=n, num_parts=num_parts)
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    actors = [
        _SSSPShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    total = sum(ray.get([a.seed.remote(src_arr) for a in actors]))
    it = 0
    history: list[dict] = [{"iter": 0, "improved": total}]
    while total and it < max_rounds:
        it += 1
        routed = ray.get([a.expand.remote() for a in actors])
        inbox: list[list] = [[] for _ in range(P)]
        for row in routed:
            for p, ref in row:
                inbox[p].append(ref)
        total = sum(
            ray.get([actors[p].absorb.remote(inbox[p]) for p in range(P)])
        )
        history.append({"iter": it, "improved": total})
    if total == 0:
        it -= 1  # the final round improved nothing
    tables = [a.slice_table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return SSSPRun(
        distances=rd.from_arrow_refs(tables), iterations=max(it, 0), history=history
    )
