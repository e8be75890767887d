"""Deterministic random-walk corpus generation (DeepWalk/node2vec-style)
on the BSP shard harness.

Beyond-reference capability: emit, for a seed panel, ``walks_per_seed``
hash-driven walks of ``length`` steps — the training-corpus generator
for graph-embedding models. The "randomness" is a salted mod-2^31-1
hash of (seed, walk index, step, current vertex), so the corpus is a
pure function of the graph: identical at any parallelism, resumable by
construction, and value-checkable in SQL (every product < 2^62 — the
same arithmetic runs in DuckDB BIGINT; same family as
``neighbor_sample._edge_hash``).

Step rule (normative): from vertex v with d>0 neighbors (the SIMPLE
graph's adjacency list sorted by destination id), the walk at step t
moves to ``neighbors[v][H(seed, widx, t, v) mod d]``; a walk at a
vertex with d=0 ends. Neighbor order = dst ascending — the store is
built ``sort_by=["src","dst"]`` so shards receive rank-indexable
adjacency with no per-shard re-sort.

Scale shape: walk positions are routed to the owner shard of their
current vertex each round (same sparse exchange as BFS — O(active
walks) per round, no dense state); emitted rows accumulate per shard
and become one Dataset at the end. Rounds = walk length.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from parallel_pagerank_ray.functions import hashing as H
from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.csr_store import cap_num_parts, EdgeShardStore, per_actor_cpus

_MIX_A = np.uint64(1_000_151)
_MIX_B = np.uint64(1_000_121)


def salt64(salt: str) -> int:
    """md5-derived salt residue mod 2^31-1 (SQL: md5 of the salt only,
    never per row)."""
    return int.from_bytes(
        hashlib.md5(salt.encode("utf-8")).digest()[:8], "big"
    ) % int(H.P31)


def walk_hash(
    s64: int,
    seed: np.ndarray,
    widx: np.ndarray,
    step: int,
    vid: np.ndarray,
) -> np.ndarray:
    """Vectorized H(seed, widx, step, vid) mod 2^31-1. Affine chain +
    one squaring round; every intermediate < 2^62 (uint64- and
    BIGINT-safe). The gate oracle reproduces this expression verbatim."""
    p = H.P31
    h = (seed.astype(np.uint64) % p) * _MIX_A % p
    h = (h + widx.astype(np.uint64) * np.uint64(31) + np.uint64(step)) % p
    h = h * _MIX_B % p
    h = (h + vid.astype(np.uint64) % p) % p
    h = (h + np.uint64(s64)) % p
    h = (h * h + h) % p
    return h


@dataclass
class WalkRun:
    walks: rd.Dataset  # (seed, widx, step, vid), step 0 = the seed
    iterations: int
    history: list[dict] = field(default_factory=list)


@ray.remote
class _WalkShard:
    def __init__(self, part: int, part_refs: list, n: int, part_size: int, s64: int) -> None:
        self.base = part * part_size
        self.size = max(0, min(part_size, n - self.base))
        self.part_size = part_size
        self.s64 = s64
        if part_refs:
            chunks = ray.get(part_refs)
            src = np.concatenate([c[0] for c in chunks]) - self.base
            dst = np.concatenate([c[1] for c in chunks])
            w = (
                np.concatenate([c[2] for c in chunks])
                if len(chunks[0]) > 2
                else None
            )
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
            w = None
        # rank-indexable adjacency: (src, dst) lexicographic. The store
        # delivers it pre-sorted (sort_by=["src","dst"]); lexsort only
        # as a defense against unordered refs.
        if src.size:
            lex_ok = bool(
                np.all(
                    (src[1:] > src[:-1])
                    | ((src[1:] == src[:-1]) & (dst[1:] >= dst[:-1]))
                )
            )
            if not lex_ok:
                order = np.lexsort((dst, src))
                src, dst = src[order], dst[order]
                if w is not None:
                    w = w[order]
        self.dst = dst
        self.indptr = np.searchsorted(src, np.arange(self.size + 1, dtype=np.int64))
        # weighted pick state: running int64 weight sum in (src, dst)
        # order; a walk at v draws r = H mod W(v) and moves to the first
        # neighbor whose cumulative weight exceeds r (probability ∝ w
        # under a uniform draw, deterministic under the hash draw)
        if w is not None:
            from parallel_pagerank_ray.stages.csr_store import int_weights

            self.cumw = np.cumsum(int_weights(w))
        else:
            self.cumw = None
        self._rows: list[tuple] = []

    def advance(self, refs: list, step: int, last: bool) -> list:
        """Record the walk positions owned here at ``step``; unless
        ``last``, hash-pick each walk's next vertex and return the
        routed positions ``[(owner_part, ref), ...]``."""
        inbox = [c for c in ray.get(list(refs)) if len(c[0])]
        if not inbox:
            return []
        seed = np.concatenate([c[0] for c in inbox])
        widx = np.concatenate([c[1] for c in inbox])
        v = np.concatenate([c[2] for c in inbox])
        self._rows.append(
            (seed, widx, np.full(len(v), step, dtype=np.int64), v)
        )
        if last:
            return []
        local = v - self.base
        lo = self.indptr[local]
        deg = self.indptr[local + 1] - lo
        alive = deg > 0
        if not alive.any():
            return []
        s, w = seed[alive], widx[alive]
        h = walk_hash(self.s64, s, w, step + 1, v[alive])
        lo_a = lo[alive]
        if self.cumw is None:
            idx = (h % deg[alive].astype(np.uint64)).astype(np.int64)
            nxt = self.dst[lo_a + idx]
        else:
            hi_a = lo_a + deg[alive]
            prev = np.where(lo_a > 0, self.cumw[lo_a - 1], 0)
            tot = (self.cumw[hi_a - 1] - prev).astype(np.uint64)
            r = (h % tot).astype(np.int64)
            pos = np.searchsorted(self.cumw, prev + r, side="right")
            nxt = self.dst[pos]
        owners = nxt // self.part_size
        order = np.argsort(owners, kind="stable")
        s, w, nxt, owners = s[order], w[order], nxt[order], owners[order]
        uniq, bounds = np.unique(owners, return_index=True)
        bounds = bounds.tolist() + [len(nxt)]
        return [
            (
                int(p),
                ray.put(
                    (
                        s[bounds[i] : bounds[i + 1]],
                        w[bounds[i] : bounds[i + 1]],
                        nxt[bounds[i] : bounds[i + 1]],
                    )
                ),
            )
            for i, p in enumerate(uniq)
        ]

    def table(self):
        import pyarrow as pa

        if not self._rows:
            return pa.table(
                {
                    "seed": pa.array([], type=pa.int64()),
                    "widx": pa.array([], type=pa.int64()),
                    "step": pa.array([], type=pa.int64()),
                    "vid": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "seed": np.concatenate([r[0] for r in self._rows]),
                "widx": np.concatenate([r[1] for r in self._rows]),
                "step": np.concatenate([r[2] for r in self._rows]),
                "vid": np.concatenate([r[3] for r in self._rows]),
            }
        )


def random_walks_bsp(
    graph: Graph,
    seeds: list[int],
    walks_per_seed: int = 4,
    length: int = 8,
    directed: bool = False,
    salt: str = "rw",
    num_parts: int | None = None,
    edges_canonical: bool = False,
) -> WalkRun:
    """Hash-driven walks over the SIMPLE graph (rank-indexed neighbor
    pick requires distinct edges; the undirected closure is built
    dedup-free from a canonical src<dst table). ``edges_canonical``
    certifies ``graph.edges`` is already that canonical table.

    A ``w`` column (positive integer weights) switches the neighbor
    pick to weighted: the walk draws r = H mod W(v) and moves to the
    first dst-ascending neighbor whose cumulative weight exceeds r
    (transition probability ∝ w under a uniform draw). A weighted
    table is taken as the caller's FINAL edge set — already simple and,
    for undirected semantics, already symmetric (mirrors sssp_bsp)."""
    n = graph.n
    if n == 0 or not seeds or walks_per_seed <= 0:
        return WalkRun(walks=rd.from_items([]), iterations=0)
    seed_arr = np.asarray([int(s) for s in seeds], dtype=np.int64)
    if seed_arr.min() < 0 or seed_arr.max() >= n:
        raise ValueError(f"seed vid out of range [0, {n})")
    if length < 0:
        raise ValueError("length must be >= 0")
    if num_parts is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_parts = cap_num_parts(min(256, max(4, cpus)), n)
    try:
        weighted = "w" in (graph.edges.schema().names or [])
    except Exception:
        weighted = False
    if weighted:
        simple = graph.edges  # caller-final weighted edge set
    elif directed:
        from parallel_pagerank_ray.pipelines.graph_build import dedup_edges

        simple = graph.edges if edges_canonical else dedup_edges(graph.edges)
    else:
        if edges_canonical:
            canon = graph.edges
        else:
            from parallel_pagerank_ray.pipelines.triangles import _simple_undirected

            canon = _simple_undirected(graph.edges)
        simple = undirected_edges(canon, dedup=False)
    store = EdgeShardStore.build(
        simple, n=n, num_parts=num_parts, sort_by=["src", "dst"]
    )
    P = max(1, -(-n // store.part_size))
    per_actor = per_actor_cpus(P)
    s64 = salt64(salt)
    actors = [
        _WalkShard.options(num_cpus=per_actor).remote(
            p, store.part_refs.get(p, []), n, store.part_size, s64
        )
        for p in range(P)
    ]
    # all walks start at their seed: (seed, widx, v=seed), routed by owner
    seed_rep = np.repeat(seed_arr, walks_per_seed)
    widx = np.tile(np.arange(walks_per_seed, dtype=np.int64), len(seed_arr))
    owners = seed_rep // store.part_size
    order = np.argsort(owners, kind="stable")
    seed_rep, widx, owners = seed_rep[order], widx[order], owners[order]
    inbox: list[list] = [[] for _ in range(P)]
    uniq, bounds = np.unique(owners, return_index=True)
    blist = bounds.tolist() + [len(seed_rep)]
    for i, p in enumerate(uniq):
        sl = slice(blist[i], blist[i + 1])
        inbox[int(p)].append(
            ray.put((seed_rep[sl], widx[sl], seed_rep[sl]))
        )
    history: list[dict] = []
    it = 0
    for step in range(length + 1):
        last = step == length
        routed = ray.get(
            [
                actors[p].advance.remote(inbox[p], step, last)
                for p in range(P)
            ]
        )
        nxt: list[list] = [[] for _ in range(P)]
        active = 0
        for row in routed:
            for p, ref in row:
                nxt[p].append(ref)
                active += 1
        history.append({"step": step, "routed_refs": active})
        inbox = nxt
        it = step
        if not last and active == 0:
            break
    tables = [a.table.remote() for a in actors]
    ray.wait(tables, num_returns=len(tables))
    for a in actors:
        ray.kill(a)
    return WalkRun(
        walks=rd.from_arrow_refs(tables), iterations=it, history=history
    )
