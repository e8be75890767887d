"""Densest-subgraph extraction by parallel (1+eps) peeling.

Beyond-reference capability (the reference computes centralities, not
subgraph mining): the densest subgraph — the vertex set maximizing
average degree E(S)/|S| — is the standard "find the core community /
spam farm / crawler trap" primitive on web graphs. Charikar's greedy
peel (remove the min-degree vertex, keep the best prefix) is a 1/2
approximation but inherently sequential; Bahmani, Kumar & Vassilvitskii
(VLDB 2012) showed that removing EVERY vertex with degree at most
(1+eps) times the current average per round gives a 1/(2(1+eps))
approximation in O(log_{1+eps} n) rounds — the MapReduce/BSP shape.

This implementation reuses the k-core peeling machinery
(pipelines/kcore.py: dst-sorted closure shards, searchsorted degree
decrements — each edge is touched at most once over the whole run) with
two changes: the kill threshold is recomputed each round from two
global scalars (alive vertex count, alive-alive degree sum), and every
vertex records its DEATH ROUND, so the best round's member set is
recovered at the end from one predicate (death >= best_round) instead
of per-round snapshots — O(E_p + size) shard state, nothing
materialized per round.

Exactness: degrees, counts and the floor-divided threshold
thr = (eps_num * S) // (eps_den * N) are integers, and the best round
is chosen by cross-multiplied density comparison (S_r * N_b vs
S_b * N_r) with ties to the EARLIER round — deterministic at any
parallelism and reproducible by a recursive-CTE round replay in SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import (
    cap_num_parts,
    EdgeShardStore,
    per_actor_cpus,
)


@dataclass
class DensestRun:
    members: rd.Dataset  # (vid,) vertices of the densest peel prefix
    best_round: int
    n_members: int
    degree_sum: int  # 2 * |E(S)| of the member set
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _DensestShard:
    """k-core peel shard with a per-round threshold and death rounds."""

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
        self.death = np.full(self.size, -1, dtype=np.int64)

    def stats(self) -> tuple[int, int]:
        """(alive count, alive-alive degree sum) — ``deg`` only counts
        edges whose far endpoint is still alive (decremented on death),
        so summing it over alive vertices is exactly 2 * E(alive)."""
        a = self.alive
        return int(a.sum()), int(self.deg[a].sum())

    def kill_below(self, thr: int, rnd: int) -> np.ndarray:
        doomed = np.nonzero(self.alive & (self.deg <= thr))[0]
        self.alive[doomed] = False
        self.death[doomed] = rnd
        return self.base + doomed

    def apply_kills(self, killed: np.ndarray) -> tuple[int, int]:
        """Decrement local degrees for edges pointing at dead vertices
        (killed arrives sorted; one searchsorted range per dead dst),
        then return next-round stats — fusing the two saves one global
        barrier per peel round."""
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
        return self.stats()

    def slice_table(self, best_round: int):
        import pyarrow as pa

        keep = (self.death < 0) | (self.death >= best_round)
        return pa.table({"vid": self.base + np.nonzero(keep)[0]})


def densest_subgraph_bsp(
    graph: Graph,
    eps_num: int = 5,
    eps_den: int = 4,
    num_parts: int | None = None,
    max_rounds: int = 10_000,
    edges_canonical: bool = False,
) -> DensestRun:
    """Bahmani et al. densest subgraph of the simple undirected closure
    of ``graph.edges``: per round, kill every alive vertex with
    degree <= (eps_num/eps_den) * (2E/N) (floored; eps_num/eps_den =
    1 + eps), record death rounds, then return the alive set at the
    start of the densest round. Progress is guaranteed — fewer than
    N / (1+eps) vertices can exceed (1+eps) times the average — so
    rounds are O(log_{1+eps} n)."""
    if eps_num <= eps_den or eps_den <= 0:
        raise ValueError("need eps_num / eps_den > 1")
    n = graph.n
    if n == 0:
        return DensestRun(
            members=rd.from_items([]),
            best_round=0,
            n_members=0,
            degree_sum=0,
            iterations=0,
        )
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
        _DensestShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    history: list[dict] = []
    best = None  # (S, N, round) under cross-multiplied density order
    rnd = 0
    parts = ray.get([a.stats.remote() for a in actors])
    while rnd < max_rounds:
        rnd += 1
        n_alive = sum(p[0] for p in parts)
        deg_sum = sum(p[1] for p in parts)
        if n_alive == 0:
            rnd -= 1
            break
        history.append({"round": rnd, "alive": n_alive, "deg_sum": deg_sum})
        # exact density comparison: S/N > Sb/Nb <=> S*Nb > Sb*N
        if best is None or deg_sum * best[1] > best[0] * n_alive:
            best = (deg_sum, n_alive, rnd)
        thr = (eps_num * deg_sum) // (eps_den * n_alive)
        killed_parts = ray.get([a.kill_below.remote(thr, rnd) for a in actors])
        killed = np.concatenate(killed_parts)
        killed.sort()
        ref = ray.put(killed)
        parts = ray.get([a.apply_kills.remote(ref) for a in actors])
    assert best is not None
    tables = [a.slice_table.remote(best[2]) for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return DensestRun(
        members=rd.from_arrow_refs(tables),
        best_round=best[2],
        n_members=best[1],
        degree_sum=best[0],
        iterations=rnd,
        history=history,
    )
