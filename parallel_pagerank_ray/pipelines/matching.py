"""Maximal matching — deterministic handshake rounds (local-min edge).

Beyond-reference capability. The classic parallel greedy matching over
the simple undirected closure (Hoepman 2004 / Israeli–Itai family,
derandomized with a fixed edge priority):

    edge key   k(u,v) = (R1*u + R2*v) mod 2^31-1 on the canonical
               (u<v) pair, totally ordered by the tuple (k, u, v) —
               pure SQL-safe vid arithmetic, no randomness exchanged
    round      every unmatched vertex proposes along its minimum-key
               alive incident edge; an edge whose BOTH endpoints
               propose it (handshake) is matched; matched vertices
               leave, their edges die

The globally minimum alive edge always handshakes, so every round
with an alive edge makes progress; rounds are O(log E) expected on
hash keys. Synchronous rounds + a total edge order make the matching
deterministic and parallelism-independent.

BSP shape (the kcore/mis harness): shards hold closure edges sorted
by (src, edge key) with advance-only cursors — "min alive incident
edge" is O(E) total across all rounds; per-round traffic is the
proposal list (vid, partner) and the matched-id list, never a dense
vector.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus

# SQL-reproducible edge-key params (functions/hashing.py policy)
MATCH_R1 = 1_000_037
MATCH_R2 = 999_983
_P31 = (1 << 31) - 1


def edge_key(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Canonical-pair edge hash, int64 < 2^31-1 (collisions are broken
    by the (key, u, v) lexicographic tuple everywhere it is used)."""
    lo = np.minimum(u, v).astype(np.int64)
    hi = np.maximum(u, v).astype(np.int64)
    return (MATCH_R1 * lo + MATCH_R2 * hi) % _P31


@dataclass
class MatchingRun:
    pairs: rd.Dataset  # (src, dst) canonical matched pairs, src < dst
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _MatchShard:
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
        k = edge_key(self.base + src, dst)
        lo = np.minimum(self.base + src, dst)
        hi = np.maximum(self.base + src, dst)
        order = np.lexsort((hi, lo, k, src))
        self.src = src[order]
        self.dst = dst[order]
        idx = np.arange(self.size, dtype=np.int64)
        self.start = np.searchsorted(self.src, idx, "left")
        self.end = np.searchsorted(self.src, idx, "right")
        self.ptr = self.start.copy()
        self.edge_alive = np.ones(len(self.src), dtype=bool)
        self.dst_order = np.argsort(self.dst, kind="stable")
        self.dst_sorted = self.dst[self.dst_order]
        self.alive = np.ones(self.size, dtype=bool)
        self.match = np.full(self.size, -1, dtype=np.int64)
        self.pairs: list[np.ndarray] = []

    def proposals(self) -> tuple:
        """(vids, partners) of alive local vertices' min-key alive
        incident edges; vertices with no alive edges drop out."""
        cand = np.nonzero(self.alive)[0]
        if len(self.src):
            active = cand[self.ptr[cand] < self.end[cand]]
            while len(active):
                adv = active[~self.edge_alive[self.ptr[active]]]
                if not len(adv):
                    break
                self.ptr[adv] += 1
                active = adv[self.ptr[adv] < self.end[adv]]
        has = self.ptr[cand] < self.end[cand]
        self.alive[cand[~has]] = False  # isolated among alive: done
        c = cand[has]
        return (
            (self.base + c).astype(np.int64),
            self.dst[self.ptr[c]].astype(np.int64),
        )

    def handshake(self, vids: np.ndarray, partners: np.ndarray) -> np.ndarray:
        """Given the round's global proposal table (sorted by vid),
        match local vertices whose proposal is reciprocated. Matched
        pairs stay IN the shard (emitted once at the end via
        slice_table — the result never round-trips the driver);
        returns only the matched local ids for the death broadcast."""
        lo = np.searchsorted(vids, self.base)
        hi = np.searchsorted(vids, self.base + self.size)
        mine = np.arange(lo, hi)
        if not len(mine):
            return np.array([], dtype=np.int64)
        u = vids[mine]
        v = partners[mine]
        pos = np.searchsorted(vids, v)
        ok = (pos < len(vids)) & (vids[np.minimum(pos, len(vids) - 1)] == v)
        recip = np.zeros(len(mine), dtype=bool)
        recip[ok] = partners[pos[ok]] == u[ok]
        mu, mv = u[recip], v[recip]
        local = mu - self.base
        self.match[local] = mv
        self.alive[local] = False
        # each pair is kept once, by the endpoint that is the canonical src
        keep = mu < mv
        if keep.any():
            self.pairs.append(
                np.stack((mu[keep], mv[keep]), axis=1).astype(np.int64)
            )
        return mu.astype(np.int64)

    def slice_table(self):
        import pyarrow as pa

        if self.pairs:
            m = np.concatenate(self.pairs)
        else:
            m = np.empty((0, 2), dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(m[:, 0], pa.int64()),
                "dst": pa.array(m[:, 1], pa.int64()),
            }
        )

    def kill_edges(self, dead: np.ndarray) -> None:
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


def matching_bsp(
    graph: Graph, num_parts: int | None = None, edges_canonical: bool = False
) -> MatchingRun:
    """Deterministic maximal matching of the simple undirected closure
    of ``graph.edges``: (src, dst) canonical matched pairs. Exact and
    parallelism-independent (total edge order, synchronous rounds)."""
    n = graph.n
    if n == 0:
        return MatchingRun(pairs=rd.from_items([]), iterations=0)
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
        _MatchShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size
        )
        for p in range(P)
    ]
    it = 0
    history: list[dict] = []
    try:
        while True:
            props = ray.get([a.proposals.remote() for a in actors])
            vids = np.concatenate([p[0] for p in props])
            partners = np.concatenate([p[1] for p in props])
            if not len(vids):
                break
            order = np.argsort(vids)
            vids, partners = vids[order], partners[order]
            vref = ray.put(vids)
            pref = ray.put(partners)
            res = ray.get([a.handshake.remote(vref, pref) for a in actors])
            matched = np.concatenate(res)
            if not len(matched):
                break  # defensive: cannot happen while alive edges exist
            matched.sort()
            dref = ray.put(matched)
            ray.get([a.kill_edges.remote(dref) for a in actors])
            it += 1
            history.append({"iter": it, "matched": int(len(matched)) // 2})
        tables = [a.slice_table.remote() for a in actors]
        ray.wait(tables, num_returns=len(tables))
    finally:
        for a in actors:
            ray.kill(a)
    return MatchingRun(
        pairs=rd.from_arrow_refs(tables), iterations=it, history=history
    )
